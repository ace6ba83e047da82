"""ReCoDeReader and merge_parts: decode and finalize containers.

Capability parity with the reference ``recode_reader.py``:

* ``ReCoDeReader`` (recode_reader.py:15-492) — open merged or intermediate
  files, build seek tables from per-frame metadata, random access
  ``get_frame(z)`` (merged only), sequential ``get_next_frame()``, raw
  pass-through ``get_next_frame_raw()`` for merging, sparse COO output,
  L2 summary-stat decode.
* ``merge_parts`` (recode_reader.py:495-595) — N-way ordered merge of
  intermediate part files into a single seekable ReCoDe file: count frames,
  copy headers, reserve the metadata region, k-way min-merge on frame_id,
  backfill the metadata table, patch ``nz``.

Decode here is vectorized numpy (oracle kernels) rather than the reference's
per-bit C loop; ``read_frames_dense`` additionally exposes a batched TPU
decode path for bulk consumers.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np
from scipy.sparse import coo_matrix

from . import codecs, oracle
from .constants import map_dtype
from .header import ReCoDeHeader
from .structures import ReCoDeStructures


class ReCoDeReader:
    """Decoder for merged (.rcX) and intermediate (.rcX_partNNN) files."""

    def __init__(self, file, is_intermediate: bool = False):
        self._source_filename = file
        self._is_intermediate = 1 if is_intermediate else 0
        self._current_frame_index = 0
        self._fp = None
        self._file_size = None
        self._rc_header: Optional[ReCoDeHeader] = None
        self._header: Optional[dict] = None
        self._structures: Optional[ReCoDeStructures] = None
        self._frame_metadata = None
        self._seek_table = None
        self._frame_data_start_position = 0
        self._sz_frame_metadata = None
        self._n_elements_frame_metadata = None
        self._numpy_dtype = None
        self._codec = None

    # ------------------------------------------------------------------- open

    def open(self, print_header: bool = False) -> None:
        self._rc_header = ReCoDeHeader()
        self._rc_header.load(self._source_filename, is_intermediate=bool(self._is_intermediate))
        self._header = self._rc_header.as_dict()
        if print_header:
            self._rc_header.print()
        codecs.import_checks(self._header)

        self._fp = open(self._source_filename, "rb")
        self._fp.seek(0, 2)
        self._file_size = self._fp.tell()
        self._fp.seek(0, 0)

        self._initialize()
        self._load_seek_table()
        self._numpy_dtype = map_dtype(int(self._header["target_dtype"]),
                                      int(self._header["target_bit_depth"]))
        if int(self._header["rc_operation_mode"]) == 1:
            self._codec = codecs.get_codec(int(self._header["compression_scheme"]),
                                           int(self._header["compression_level"]))

    def _initialize(self) -> None:
        # header fields are untrusted bytes: validate before they size any
        # buffer or index any schema (the reference crashes on corrupt
        # input, recode_reader.py:127-168 — we fail clean instead)
        level = int(self._header["reduction_level"])
        mode = int(self._header["rc_operation_mode"])
        ny, nx = int(self._header["ny"]), int(self._header["nx"])
        if level not in (1, 2, 3, 4):
            raise ValueError(f"Invalid reduction level in header: {level}")
        if mode not in (0, 1):
            raise ValueError(f"Invalid rc_operation_mode in header: {mode}")
        if not (0 < ny <= 65536 and 0 < nx <= 65536):
            raise ValueError(f"Invalid frame shape in header: ({ny}, {nx})")
        if int(self._header["nz"]) > (self._file_size or 0):
            # every frame occupies >= 1 byte of metadata or data, so nz
            # beyond the file size is corrupt — and would otherwise size
            # the seek table and the python metadata loop (up to 4e9)
            raise ValueError(
                f"Header nz={int(self._header['nz'])} exceeds file size "
                f"{self._file_size}")
        self._structures = ReCoDeStructures(self._header)

        sm = self._structures.standard_frame_metadata_structure_for(level, mode)
        nsm = self._rc_header.non_standard_metadata_sizes
        self._sz_frame_metadata = (
            self._structures.get_standard_frame_metadata_size(level, mode) + sum(nsm.values())
        )
        self._n_elements_frame_metadata = len(sm) + len(nsm)
        self._frame_data_start_position = self._rc_header.get_frame_data_offset(
            bool(self._is_intermediate), self._sz_frame_metadata)

    def _load_seek_table(self) -> None:
        """Build the per-frame seek table for merged files.

        The metadata table sits between the headers and the frame data; frame
        offsets are the cumulative sum of per-frame sizes
        (recode_reader.py:127-168).
        """
        if self._is_intermediate:
            return
        level = int(self._header["reduction_level"])
        mode = int(self._header["rc_operation_mode"])
        sm = self._structures.standard_frame_metadata_structure_for(level, mode)
        nz = int(self._header["nz"])

        meta_start = self._rc_header.get_frame_data_offset(True, self._sz_frame_metadata)
        if meta_start + nz * self._sz_frame_metadata > self._file_size:
            raise ValueError(
                "Frame metadata table extends past end of file "
                f"(nz={nz}, {self._sz_frame_metadata} B/frame, "
                f"file is {self._file_size} B)")
        self._fp.seek(meta_start, 0)
        raw = self._fp.read(nz * self._sz_frame_metadata)

        self._frame_metadata = []
        pos = 0
        for _ in range(nz):
            d = {}
            for field in sm:
                d[field["name"]] = int.from_bytes(raw[pos: pos + field["bytes"]], "little")
                pos += field["bytes"]
            for name, size in self._rc_header.non_standard_metadata_sizes.items():
                d[name] = raw[pos: pos + size]
                pos += size
            self._frame_metadata.append(d)

        self._seek_table = np.zeros((nz, 2), dtype=np.uint64)
        for z in range(nz):
            self._seek_table[z, 0] = self._structures.get_frame_data_size(
                level, mode, self._frame_metadata[z])
        self._seek_table[1:, 1] = np.cumsum(self._seek_table[:-1, 0])
        # corrupt u32 length fields make the cumulative frame sizes overrun
        # the file — catch it here once instead of short-read surprises (or
        # giant buffer allocations) at every later get_frame
        if nz and int(self._seek_table[-1, 1] + self._seek_table[-1, 0]) > (
                self._file_size - self._frame_data_start_position):
            raise ValueError(
                "Seek table extends past end of file (corrupt per-frame "
                "length fields)")

    # ------------------------------------------------------------- properties

    def get_header(self) -> ReCoDeHeader:
        return self._rc_header

    def get_source_header(self):
        return self._rc_header.source_header

    def get_shape(self):
        return (int(self._header["nz"]), int(self._header["ny"]), int(self._header["nx"]))

    get_true_shape = get_shape

    def get_dtype(self):
        return self._header["target_dtype"]

    @property
    def sz_frame_metadata(self):
        return self._sz_frame_metadata

    def get_file_position(self) -> int:
        return self._fp.tell()

    def seek_to_frame_data(self) -> None:
        self._frame_data_start_position = self._rc_header.get_frame_data_offset(
            bool(self._is_intermediate), self._sz_frame_metadata)
        self._fp.seek(0, 2)
        if self._frame_data_start_position <= self._fp.tell():
            self._fp.seek(self._frame_data_start_position, 0)

    # ------------------------------------------------------------------- read

    def _read_intermediate_metadata(self):
        """Read [frame_id u32][metadata fields] at the current position."""
        # part files grow during acquisition (live viewing): refresh the size
        self._file_size = os.fstat(self._fp.fileno()).st_size
        level = int(self._header["reduction_level"])
        mode = int(self._header["rc_operation_mode"])
        sm = self._structures.standard_frame_metadata_structure_for(level, mode)
        if self._file_size - self._fp.tell() < 4 + self._sz_frame_metadata:
            return None, None
        frame_id = int.from_bytes(self._fp.read(4), "little")
        d = {}
        for field in sm:
            d[field["name"]] = int.from_bytes(self._fp.read(field["bytes"]), "little")
        for name, size in self._rc_header.non_standard_metadata_sizes.items():
            d[name] = self._fp.read(size)
        return frame_id, d

    def get_frame(self, z: int):
        """Random access to frame z (merged files only, recode_reader.py:188)."""
        if self._is_intermediate:
            raise ValueError("Random access is not available for intermediate files")
        if not 0 <= z < int(self._header["nz"]):
            raise ValueError("Requested frame index is greater than number of frames in dataset")
        self._fp.seek(self._frame_data_start_position + int(self._seek_table[z, 1]), 0)
        if self._file_size - self._fp.tell() == 0:
            return None
        frame_dict = self._decode_current(self._frame_metadata[z])
        if frame_dict is None:
            return None
        self._current_frame_index = z + 1
        return {z: frame_dict}

    def get_next_frame(self):
        """Sequential decode (recode_reader.py:223-273)."""
        if self._current_frame_index == 0:
            self._fp.seek(self._frame_data_start_position, 0)
        if self._is_intermediate:
            # part files grow during acquisition (live viewing)
            self._file_size = os.fstat(self._fp.fileno()).st_size
        if self._file_size - self._fp.tell() == 0:
            return None
        if not self._is_intermediate and self._current_frame_index >= int(self._header["nz"]):
            raise ValueError("Requested frame index is greater than number of frames in dataset")

        if self._is_intermediate:
            frame_id, d = self._read_intermediate_metadata()
            if frame_id is None:
                return None
        else:
            frame_id = self._current_frame_index
            d = self._frame_metadata[frame_id]

        frame_dict = self._decode_current(d)
        if frame_dict is None:
            self._header["nz"] = self._current_frame_index
            return None
        self._current_frame_index += 1
        return {frame_id: frame_dict}

    def get_next_frame_raw(self, read_data: bool = True):
        """Raw pass-through of the next frame (for merge, recode_reader.py:275-324)."""
        if self._current_frame_index == 0:
            self._fp.seek(self._frame_data_start_position, 0)
        if not self._is_intermediate and self._current_frame_index >= int(self._header["nz"]):
            raise ValueError("Requested frame index is greater than number of frames in dataset")

        if self._is_intermediate:
            self._file_size = os.fstat(self._fp.fileno()).st_size
            frame_id, d = self._read_intermediate_metadata()
            if frame_id is None:
                return None
        else:
            if self._file_size - self._fp.tell() == 0:
                return None
            frame_id = self._current_frame_index
            d = self._frame_metadata[frame_id]

        raw = self._read_raw_blobs(d, read_data=read_data)
        if raw is None:
            return None
        self._current_frame_index += 1
        return {frame_id: {"metadata": d, "data": raw}}

    def _read_raw_blobs(self, metadata: dict, read_data: bool = True):
        level = int(self._header["reduction_level"])
        mode = int(self._header["rc_operation_mode"])
        if mode == 0:
            sz_binary_map = self._structures.binary_image_sz_bytes
        else:
            sz_binary_map = int(metadata["bytes_in_compressed_binary_map"])

        if self._file_size - self._fp.tell() < sz_binary_map:
            return None
        if read_data:
            binary_map = self._fp.read(sz_binary_map)
        else:
            binary_map = None
            self._fp.seek(sz_binary_map, 1)

        if level in (1, 2):
            if level == 1:
                key = "bytes_in_packed_pixvals" if mode == 0 else "bytes_in_compressed_pixvals"
            else:
                key = "bytes_in_packed_summary_stats" if mode == 0 else "bytes_in_compressed_summary_stats"
            sz_pixvals = int(metadata[key])
            if self._file_size - self._fp.tell() < sz_pixvals:
                return None
            if read_data:
                pixvals = self._fp.read(sz_pixvals)
            else:
                pixvals = None
                self._fp.seek(sz_pixvals, 1)
            return {"binary_map": binary_map, "pixvals": pixvals}
        return {"binary_map": binary_map}

    def _decode_current(self, metadata: dict):
        """Decode the frame at the current file position into a COO frame."""
        level = int(self._header["reduction_level"])
        mode = int(self._header["rc_operation_mode"])
        ny, nx = int(self._header["ny"]), int(self._header["nx"])
        bit_depth = int(self._header["target_bit_depth"])

        raw = self._read_raw_blobs(metadata, read_data=True)
        if raw is None:
            return None
        binary_map = raw["binary_map"]
        pixvals = raw.get("pixvals")
        if mode == 1:
            binary_map = self._codec.decompress(binary_map)
            if pixvals is not None:
                pixvals = self._codec.decompress(pixvals)

        from . import native

        if level == 1:
            rows, cols, vals = native.unpack_frame_sparse(
                binary_map, pixvals, ny, nx, bit_depth, 1)
            data = coo_matrix((vals.astype(self._numpy_dtype), (rows, cols)),
                              shape=(ny, nx), dtype=self._numpy_dtype)
            return {"metadata": metadata, "data": data}
        if level == 2:
            rows, cols, vals = native.unpack_frame_sparse(
                binary_map, None, ny, nx, bit_depth, 2)
            data = coo_matrix((vals.astype(self._numpy_dtype), (rows, cols)),
                              shape=(ny, nx), dtype=self._numpy_dtype)
            # True puddle count from a label pass over the decoded bitmap:
            # inferring it from the packed byte length ((n_packed*8)//bit_depth)
            # over-counts for bit_depth not dividing 8 — the final byte's pad
            # bits would decode as spurious zero-valued puddles.
            mask = np.zeros((ny, nx), np.uint8)
            mask[rows.astype(np.int64), cols.astype(np.int64)] = 1
            _, n_puddles = native.label_components(mask)
            stats = oracle.decode_summary_stats(pixvals, bit_depth, n_puddles, dtype=self._numpy_dtype)
            return {"metadata": metadata, "data": data, "summary_stats": stats}
        # L3 / L4: bitmap only, value 1 per set bit
        rows, cols, vals = native.unpack_frame_sparse(
            binary_map, None, ny, nx, bit_depth, level)
        data = coo_matrix((vals.astype(self._numpy_dtype), (rows, cols)),
                          shape=(ny, nx), dtype=self._numpy_dtype)
        return {"metadata": metadata, "data": data}

    # --------------------------------------------------------- batched decode

    def read_frames_dense(self, start: int, count: int, use_tpu: bool = True,
                          verify: bool = False) -> np.ndarray:
        """Bulk-decode ``count`` frames starting at ``start`` to a dense array.

        A TPU-batched extension beyond the reference API: L1 frames decode on
        device via :func:`pyrecode_tpu.ops.decode_l1_frames` (one fused gather
        kernel for the whole batch).

        ``verify`` — integrity/speed tradeoff for scheme-12 containers: the
        default fast path (the fully-device gap chain) never materializes
        bitmap bytes, so stream adler32 checksums are NOT checked and on-disk
        corruption decodes to garbage.  ``verify=True`` routes the decode
        through the byte-reconstruction path, which verifies every stream's
        adler32 and raises on mismatch (at ~1/3 the read throughput).
        """
        if self._is_intermediate:
            raise ValueError("Random access is not available for intermediate files")
        level = int(self._header["reduction_level"])
        ny, nx = int(self._header["ny"]), int(self._header["nx"])
        bit_depth = int(self._header["target_bit_depth"])
        mode = int(self._header["rc_operation_mode"])
        if not 0 <= start < int(self._header["nz"]):
            raise ValueError("Requested frame index is greater than number of frames in dataset")
        count = min(count, int(self._header["nz"]) - start)

        bitmaps = np.zeros((count, self._structures.binary_image_sz_bytes), dtype=np.uint8)
        raw_blobs = []
        for i in range(count):
            z = start + i
            self._fp.seek(self._frame_data_start_position + int(self._seek_table[z, 1]), 0)
            raw = self._read_raw_blobs(self._frame_metadata[z], read_data=True)
            raw_blobs.append((raw["binary_map"], raw.get("pixvals")))
        pixval_blobs = []
        scheme = int(self._header["compression_scheme"])
        # scheme 12 on a real TPU: batched DEVICE symbol decode (the rANS
        # per-symbol math runs in ops/pallas_rans.py; one kernel invocation
        # covers every frame's bitmap+pixval streams)
        dev12 = mode == 1 and scheme == 12 and use_tpu
        if dev12 and not getattr(self, "_force_device_codec", False):
            try:
                import jax

                dev12 = jax.devices()[0].platform == "tpu"
            except Exception:
                dev12 = False
        if dev12 and level == 1:
            # fully-device gap chain: gap-mode bitmap stream decodes to
            # set-bit POSITIONS and symbol-mode pixvals to values; the
            # dense frames come straight from the positions-driven Pallas
            # decode — no bitmap bytes, no host reconstruction at all
            # (reference: one scalar C loop per frame, reader.h:10-68)
            from .codecs import rans as _rans

            if all(pv is not None for _, pv in raw_blobs):
                dense = _rans.decode_l1_gap_device(
                    [bm for bm, _ in raw_blobs],
                    [pv for _, pv in raw_blobs], ny, nx, verify=verify)
                if dense is None:
                    # dense-data flavor: bitmap bytes coded as 8-bit
                    # symbols take the bitmap-driven device chain
                    dense = _rans.decode_l1_symbol_device(
                        [bm for bm, _ in raw_blobs],
                        [pv for _, pv in raw_blobs], ny, nx, verify=verify)
                if dense is not None:
                    return dense.astype(self._numpy_dtype)
        if dev12:
            from .codecs import rans as _rans

            flat = [b for pair in raw_blobs for b in pair if b is not None]
            dec = _rans.rans_decompress_device_batch(flat)
            it = iter(dec)
            for i, (bm, pv) in enumerate(raw_blobs):
                bitmaps[i] = np.frombuffer(next(it), dtype=np.uint8)
                pixval_blobs.append(next(it) if pv is not None else None)
            raw_blobs = []
        # schemes whose decompress is stateless / thread-safe (zstd and
        # blosc hold per-codec context objects that are not; the native
        # rANS decoder uses thread_local scratch)
        pool_safe = scheme in (0, 2, 3, 4, 5, 12)
        if raw_blobs == [] and dev12:
            pass
        elif mode == 1 and count > 1 and pool_safe:
            # the entropy decode dominates bulk reads and the codecs release
            # the GIL: fan the per-frame decompression over threads (the
            # reference decompresses serially, recode_reader.py:379-462)
            from concurrent.futures import ThreadPoolExecutor
            import os as _os

            def _inflate(blob_pair):
                bm, pv = blob_pair
                return (self._codec.decompress(bm),
                        self._codec.decompress(pv) if pv is not None else None)

            with ThreadPoolExecutor(
                    max_workers=min(count,
                                    max((_os.cpu_count() or 2) // 2,
                                        1))) as ex:
                inflated = list(ex.map(_inflate, raw_blobs))
            for i, (bm, pv) in enumerate(inflated):
                bitmaps[i] = np.frombuffer(bm, dtype=np.uint8)
                pixval_blobs.append(pv)
        else:
            for i, (bm, pv) in enumerate(raw_blobs):
                if mode == 1:
                    bm = self._codec.decompress(bm)
                    if pv is not None:
                        pv = self._codec.decompress(pv)
                bitmaps[i] = np.frombuffer(bm, dtype=np.uint8)
                pixval_blobs.append(pv)

        if level != 1 or not use_tpu:
            out = np.zeros((count, ny, nx), dtype=self._numpy_dtype)
            for i in range(count):
                rows, cols, vals = oracle.decode_frame_sparse(
                    bitmaps[i].tobytes(), pixval_blobs[i], ny, nx, bit_depth, level,
                    dtype=self._numpy_dtype)
                out[i, rows.astype(int), cols.astype(int)] = vals
            return out

        from . import ops
        from .ops import pallas_decode, pallas_encode

        g_vals, g_bytes = ops.packed_group_shape(bit_depth)
        max_bytes = max((len(b) for b in pixval_blobs), default=g_bytes)
        max_bytes = -(-max_bytes // g_bytes) * g_bytes
        packed = np.zeros((count, max_bytes), dtype=np.uint8)
        for i, blob in enumerate(pixval_blobs):
            packed[i, : len(blob)] = np.frombuffer(blob, dtype=np.uint8)

        if pallas_encode.supports(ny, nx, bit_depth):
            for bucket in range(pallas_encode.num_buckets()):
                dense, overflow = pallas_decode.decode_l1_pallas(
                    bitmaps, packed, ny, nx, bit_depth, bucket=bucket)
                if not bool(np.asarray(overflow).any()):
                    return np.asarray(dense).astype(self._numpy_dtype, copy=False)
        dense = ops.decode_l1_frames(bitmaps, packed, ny, nx, bit_depth,
                                     out_dtype=self._numpy_dtype)
        return np.asarray(dense)

    # ------------------------------------------------------------------ close

    def copy_headers_to(self, target_fp, source_header_length: int) -> None:
        self._fp.seek(0, 0)
        target_fp.write(self._fp.read(self._rc_header.recode_header_length))
        target_fp.write(self._fp.read(source_header_length))

    def close(self) -> None:
        if self._fp is not None:
            self._fp.close()
            self._fp = None


def merge_parts(folder_path: str, base_filename: str, num_parts: int) -> str:
    """Merge intermediate part files into one seekable ReCoDe file.

    Reproduces reference recode_reader.py:495-595: ordered k-way merge on
    frame_id, metadata table backfilled before the frame data, ``nz`` patched
    to the true merged frame count.  Returns the merged file path.
    """
    part_names = [
        os.path.join(folder_path, f"{base_filename}_part{index:03d}")
        for index in range(num_parts)
    ]

    target_path = os.path.join(folder_path, base_filename)
    target = open(target_path, "wb")

    reader0 = ReCoDeReader(part_names[0], is_intermediate=True)
    reader0.open()
    header = reader0.get_header().as_dict()
    source_header_length = int(header["source_header_length"])
    reader0.copy_headers_to(target, source_header_length)
    sz_frame_metadata = reader0.sz_frame_metadata
    header_length = reader0.get_header().recode_header_length
    nz_position = reader0.get_header().get_field_position_in_bytes("nz")
    nz_bytes = reader0.get_header().get_definition("nz")["bytes"]
    reader0.close()

    # open all parts and load their first frames
    readers = []
    pending = []  # current {frame_id: {...}} per part, or None at EOF
    for name in part_names:
        reader = ReCoDeReader(name, is_intermediate=True)
        reader.open()
        readers.append(reader)
        pending.append(reader.get_next_frame_raw())

    # count total frames cheaply: we merge until all parts are exhausted, so
    # reserve the metadata region using per-part frame counts from a fast scan
    counts = []
    for name in part_names:
        scan = ReCoDeReader(name, is_intermediate=True)
        scan.open()
        n = 0
        while scan.get_next_frame_raw(read_data=False) is not None:
            n += 1
        counts.append(n)
        scan.close()
    total_frames = int(np.sum(counts))

    target.seek(total_frames * sz_frame_metadata, 1)

    # k-way min-merge on frame_id
    metadata_rows = []
    level = int(header["reduction_level"])
    mode = int(header["rc_operation_mode"])
    from .structures import _SCHEMA

    metadata_fields = _SCHEMA[(level, mode)]

    while True:
        live = [(i, next(iter(p.keys()))) for i, p in enumerate(pending) if p is not None]
        if not live:
            break
        part_index, frame_id = min(live, key=lambda t: t[1])
        frame = pending[part_index][frame_id]
        metadata_rows.append(frame["metadata"])
        for blob in frame["data"].values():
            target.write(blob)
        pending[part_index] = readers[part_index].get_next_frame_raw()

    # backfill the metadata table (frame_id is dropped: recode_reader.py:584-585)
    target.seek(header_length + source_header_length, 0)
    for row in metadata_rows:
        for field in metadata_fields:
            # honor each field's declared width so writer and reader share one
            # source of truth (reader parses with field['bytes'])
            target.write(int(row[field["name"]]).to_bytes(field["bytes"], "little"))

    # patch nz with the true merged frame count
    target.seek(nz_position, 0)
    target.write(len(metadata_rows).to_bytes(nz_bytes, "little"))
    target.close()

    for reader in readers:
        reader.close()
    return target_path
