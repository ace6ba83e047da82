"""Device deflate kernels (interpret mode) vs the native encoder, byte-exact.

Exercises the cross-chunk carries of both kernels: runs spanning (and much
longer than) the 4096-byte tokenize tiles, token streams crossing the
2048-token assembly steps, and every take-boundary corner of the C
tokenizer.  tools/bench_deflate.py runs the same pipeline on the real TPU.
"""

import zlib

import numpy as np
import pytest

from pyrecode_tpu import native
from pyrecode_tpu.codecs import dyndeflate as dd
from pyrecode_tpu.ops import pallas_deflate as pdk

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library unavailable")


def _battery():
    rng = np.random.default_rng(7)
    T = pdk.CH_A                             # pass-A tile size in bytes
    streams = [
        b"",
        b"\x00" * T,                         # run == exactly one tile
        b"\x00" * (T + 1),                   # run crosses the tile boundary
        b"X" * (T - 6) + b"\x00" * 5000 + b"Y",  # long run straddling tiles
        b"A" + b"\x00" * 520 + b"B",
        b"\x07" * 261 + b"xy" + b"\x07" * 519,
        (rng.integers(0, 256, 9000)
         * (rng.random(9000) < 0.02)).astype(np.uint8).tobytes(),
        bytes(rng.integers(0, 256, 5000).astype(np.uint8)),  # stored fallback
        bytes(rng.integers(0, 3, 11000).astype(np.uint8)),   # dense tokens
    ]
    # runs ending exactly at every distance from a tile edge near take
    # boundaries
    for off in (T - 2, T - 1, T):
        streams.append(b"Q" * off + b"\x00" * 259 + b"R" * 40)
    return streams


def _pack(raws, npad):
    streams = np.zeros((len(raws), npad), np.uint8)
    lengths = np.zeros(len(raws), np.int32)
    for i, r in enumerate(raws):
        streams[i, : len(r)] = np.frombuffer(r, np.uint8)
        lengths[i] = len(r)
    return streams, lengths


def test_device_pipeline_matches_native_bytes():
    raws = _battery()
    npad = 4 * pdk.CH_A
    streams, lengths = _pack(raws, npad)
    outs = dd.deflate_batch_device(streams, lengths,
                                   raw_cb=lambda i: raws[i], interpret=True)
    for i, (raw, got) in enumerate(zip(raws, outs)):
        assert got == native.deflate_sparse(raw), (i, len(raw))
        assert zlib.decompress(got) == raw, i


def test_tokenize_outputs_match_numpy_reference():
    raws = _battery()
    npad = 4 * pdk.CH_A
    streams, lengths = _pack(raws, npad)
    tok, hist, adler = pdk.tokenize_pallas(streams, lengths, interpret=True)
    lut = pdk.NO_TOKEN - np.asarray(tok).astype(np.int32)  # un-invert
    hist = np.asarray(hist)
    adler = np.asarray(adler)
    for i, raw in enumerate(raws):
        n = len(raw)
        ref_lut, ref_sym = dd.tokenize_bytes_np(np.frombuffer(raw, np.uint8))
        assert np.array_equal(lut[i, :n], ref_lut), i
        assert np.all(lut[i, n:] == pdk.NO_TOKEN), i
        ref_hist = dd.histogram_np(ref_sym)
        ref_hist[256] -= 1  # kernel histogram excludes EOB
        assert np.array_equal(hist[i, :286], ref_hist), i
        assert int(adler[i]) == zlib.adler32(raw), i


def test_fuzz_random_sparse_streams():
    rng = np.random.default_rng(123)
    raws = []
    for _ in range(8):
        n = int(rng.integers(0, 3 * pdk.CH_A))
        density = float(rng.choice([0.005, 0.05, 0.3, 0.9]))
        s = (rng.integers(0, 256, n) * (rng.random(n) < density)).astype(np.uint8)
        raws.append(s.tobytes())
    npad = 3 * pdk.CH_A
    streams, lengths = _pack(raws, npad)
    outs = dd.deflate_batch_device(streams, lengths,
                                   raw_cb=lambda i: raws[i], interpret=True)
    for i, (raw, got) in enumerate(zip(raws, outs)):
        assert got == native.deflate_sparse(raw), (i, len(raw))


def _assemble_inputs(raw):
    """Host-side table construction for one stream (mirrors
    dyndeflate.deflate_batch_device's per-stream loop)."""
    import jax.numpy as jnp

    x = np.frombuffer(raw, np.uint8)
    lut_idx, sym = dd.tokenize_bytes_np(x)
    lfreq = dd.histogram_np(sym)
    llen, lcode = native.dyn_tables(lfreq)
    hb, hbits = native.dyn_header(llen)
    lutab = dd.luts_as_radix(llen, lcode)
    npad = -(-max(x.size, 1) // pdk.CH_B) * pdk.CH_B
    # assemble consumes the inverted u16 stream (pad 0 = no token)
    tok_pad = np.zeros((1, npad), np.uint16)
    tok_pad[0, : x.size] = (pdk.NO_TOKEN - lut_idx).astype(np.uint16)
    phase = np.array([hbits % 8], np.int32)
    partial = np.array([int(hb[-1]) if hbits % 8 else 0], np.int32)
    return (jnp.asarray(tok_pad), jnp.asarray(lutab[None]),
            jnp.asarray(phase), jnp.asarray(partial), 2 * npad + 256)


def test_assemble_narrow_window_presets_match_wide():
    """Every preset that does not overflow must produce bytes identical to
    the always-sufficient widest window; a bit-heavy stream must trip the
    overflow flag on the narrowest preset."""
    rng = np.random.default_rng(11)
    sparse = (rng.integers(0, 256, 6000)
              * (rng.random(6000) < 0.02)).astype(np.uint8).tobytes()
    # adversarial: 20k alternating 0/1 literals make bytes 128..255 rare
    # (~10-bit codes), then a block of those rare literals long enough to
    # fill at least one aligned CH_B-token step entirely at ~10 bits/token,
    # which exceeds the narrowest (~4.5 bits/token) preset's capacity
    n_rare = 2 * pdk.CH_B + 1024
    dense = (np.arange(20000, dtype=np.uint8) % 2).tobytes() + \
        (128 + np.arange(n_rare, dtype=np.uint8) % 128).tobytes()

    for raw in (sparse, dense):
        args = _assemble_inputs(raw)
        ref_body, ref_bits, ref_ovf = pdk.assemble_pallas(
            *args, nw=pdk.WIN_ROWS_MAX, interpret=True)
        assert not bool(ref_ovf[0])
        tripped = 0
        for nw in pdk.WIN_ROWS_PRESETS[:-1]:
            body, bits, ovf = pdk.assemble_pallas(*args, nw=nw,
                                                  interpret=True)
            if bool(ovf[0]):
                tripped += 1
                continue
            assert int(bits[0]) == int(ref_bits[0]), nw
            assert np.array_equal(np.asarray(body), np.asarray(ref_body)), nw
        if raw is dense:
            assert tripped >= 1  # 8.4-bit preset must flag ~9-bit literals


def test_literal_dense_sliced_assembly():
    """Literal-dense streams (dynamic-mode packed intensities) skip the
    compaction pass and assemble over a length-bound SLICE of the token
    stream (r5): bytes must stay identical to the native encoder, for
    lengths straddling the quantize_bound grid."""
    rng = np.random.default_rng(17)
    npad = 8 * pdk.CH_A          # 128 KiB capacity pad
    raws = []
    for n in (3 * pdk.CH_B - 5, 3 * pdk.CH_B, 5 * pdk.CH_B + 1,
              11000):
        # low-entropy-alphabet random bytes: compressible, so the dynamic
        # block wins (no stored fallback) and nearly every byte is a
        # literal token
        raws.append(bytes(rng.integers(0, 11, n).astype(np.uint8)))
    streams, lengths = _pack(raws, npad)
    outs = dd.deflate_batch_device(streams, lengths,
                                   raw_cb=lambda i: raws[i], interpret=True)
    for i, (raw, got) in enumerate(zip(raws, outs)):
        assert got == native.deflate_sparse(raw), (i, len(raw))
        assert zlib.decompress(got) == raw, i


def test_narrow_window_retry_in_pipeline(monkeypatch):
    """Force the narrowest preset: the pipeline must detect overflow and
    transparently re-run wide, still byte-identical to the native encoder."""
    monkeypatch.setattr(pdk, "window_rows_for",
                        lambda est: pdk.WIN_ROWS_PRESETS[0])
    rng = np.random.default_rng(5)
    raws = [bytes(rng.integers(0, 256, 7000).astype(np.uint8)),
            (rng.integers(0, 256, 7000)
             * (rng.random(7000) < 0.3)).astype(np.uint8).tobytes()]
    streams, lengths = _pack(raws, 2 * pdk.CH_A)
    outs = dd.deflate_batch_device(streams, lengths,
                                   raw_cb=lambda i: raws[i], interpret=True)
    for i, (raw, got) in enumerate(zip(raws, outs)):
        assert got == native.deflate_sparse(raw), i


def test_writer_device_entropy_roundtrip(tmp_path):
    """Writer with the TPU entropy stage forced on (interpret mode): the
    container must be byte-identical to the host fast-deflate container and
    decode bit-exactly."""
    from pyrecode_tpu import InputParams
    from pyrecode_tpu.reader import ReCoDeReader, merge_parts
    from pyrecode_tpu.writer import ReCoDeWriter

    rng = np.random.default_rng(3)
    data = np.where(rng.random((4, 64, 64)) < 0.04,
                    rng.integers(1, 4096, (4, 64, 64)), 0).astype(np.uint16)
    dark = np.zeros((64, 64), np.uint16)
    params = InputParams(dict(
        reduction_level=1, rc_operation_mode=1, calibration_threshold_epsilon=0,
        target_bit_depth=12, source_bit_depth=12, num_cols=64, num_rows=64,
        num_frames=4, frame_offset=0, num_calibration_frames=1,
        calibration_frame_offset=0, keep_part_files=0, num_threads=1,
        l2_statistics=0, l4_centroiding=0, compression_scheme=0,
        compression_level=1, source_file_type=0, source_header_length=0,
        keep_calibration_data=1, calibration_file_type=0, source_data_type=0,
        target_data_type=0))
    assert params.validate()

    def write(subdir, device_entropy):
        out = tmp_path / subdir
        out.mkdir()
        w = ReCoDeWriter("vol", dark_data=dark, output_directory=str(out),
                         input_params=params, device_entropy=device_entropy,
                         fast_deflate=True)
        w.start()
        w.run(data)
        w.close()
        return out / "vol.rc1_part000"

    dev_part = write("dev", True)
    host_part = write("host", False)
    assert dev_part.read_bytes() == host_part.read_bytes()

    merge_parts(str(tmp_path / "dev"), "vol.rc1", 1)
    reader = ReCoDeReader(str(tmp_path / "dev" / "vol.rc1"))
    reader.open()
    for i in range(4):
        fd = reader.get_next_frame()
        assert np.array_equal(fd[i]["data"].todense(), data[i]), i
    reader.close()


def test_fused_tokenize_compact_matches_two_pass():
    """tokenize_compact_pallas must produce the same dense token stream,
    histogram and adler as tokenize_pallas + compact_tokens, across
    capacities that do and do not overflow."""
    rng = np.random.default_rng(31)
    raws = [
        (rng.integers(0, 256, 3 * pdk.CH_A)
         * (rng.random(3 * pdk.CH_A) < 0.02)).astype(np.uint8).tobytes(),
        (rng.integers(0, 256, 20000)
         * (rng.random(20000) < 0.25)).astype(np.uint8).tobytes(),
        b"\x00" * 5000 + bytes(rng.integers(0, 256, 2048).astype(np.uint8)),
    ]
    npad = 3 * pdk.CH_A
    streams, lengths = _pack(raws, npad)
    tok, hist_ref, adler_ref = pdk.tokenize_pallas(streams, lengths,
                                                   interpret=True)
    tok_bound = 2 * pdk.CH_B
    dense_ref, counts_ref, _ = pdk.compact_tokens(tok, tok_bound, bucket=2,
                                                  interpret=True)
    # bucket 1 fits all three streams; bucket 0 must overflow the dense one.
    # (higher buckets are interpret-prohibitive: rank-match traces C1/2
    # passes)
    for bucket in (0, 1):
        dense, hist, adler, counts, ovf = pdk.tokenize_compact_pallas(
            streams, lengths, bucket, tok_bound, interpret=True)
        # histogram and adler are exact regardless of capacity overflow
        assert np.array_equal(np.asarray(hist), np.asarray(hist_ref)), bucket
        assert np.array_equal(np.asarray(adler), np.asarray(adler_ref))
        if not bool(np.asarray(ovf).any()):
            assert np.array_equal(np.asarray(counts), np.asarray(counts_ref))
            assert np.array_equal(np.asarray(dense).astype(np.uint16),
                                  np.asarray(dense_ref)), bucket
    # the dense literal block forces > 256 tokens in one 2048-lane row:
    # the smallest bucket must flag overflow
    _, _, _, _, ovf0 = pdk.tokenize_compact_pallas(
        streams, lengths, 0, tok_bound, interpret=True)
    assert bool(np.asarray(ovf0)[2])


def test_hint_state_drives_fused_path_and_stays_byte_identical():
    """Two successive deflate_batch_device calls with a shared hint_state:
    the first (two-pass) seeds the density, the second runs the fused
    kernel; both must match the native encoder byte-for-byte."""
    rng = np.random.default_rng(77)
    hint: dict = {"fused": True}  # explicit opt-in (also the default)
    for round_ in range(2):
        raws = [(rng.integers(0, 256, 2 * pdk.CH_A)
                 * (rng.random(2 * pdk.CH_A) < 0.03)).astype(np.uint8).tobytes()
                for _ in range(2)]
        streams, lengths = _pack(raws, 2 * pdk.CH_A)
        outs = dd.deflate_batch_device(streams, lengths,
                                       raw_cb=lambda i: raws[i],
                                       interpret=True, hint_state=hint)
        for i, (raw, got) in enumerate(zip(raws, outs)):
            assert got == native.deflate_sparse(raw), (round_, i)
        assert 0 < hint["density"] < 0.2


@pytest.mark.parametrize("level,scheme", [
    (2, 0), (4, 0),
    # scheme-12 L2 writer integration: ~45 s of interpret builds; the rANS
    # kernels themselves are hw-gated (verify_hw) and scheme-12 writer
    # round-trips run in test_rans
    pytest.param(2, 12, marks=pytest.mark.slow),
])
def test_writer_device_entropy_l2_l4(tmp_path, level, scheme):
    """Device entropy on the XLA (L2/L4) encode path: the container must be
    byte-identical to the host-compressed container and decode bit-exactly."""
    from pyrecode_tpu import InputParams
    from pyrecode_tpu.reader import ReCoDeReader, merge_parts
    from pyrecode_tpu.writer import ReCoDeWriter

    rng = np.random.default_rng(14)
    data = np.where(rng.random((2, 64, 64)) < 0.03,
                    rng.integers(1, 4096, (2, 64, 64)), 0).astype(np.uint16)
    dark = np.zeros((64, 64), np.uint16)
    values = dict(
        reduction_level=level, rc_operation_mode=1,
        calibration_threshold_epsilon=0,
        target_bit_depth=12, source_bit_depth=12, num_cols=64, num_rows=64,
        num_frames=2, frame_offset=0, num_calibration_frames=1,
        calibration_frame_offset=0, keep_part_files=1, num_threads=1,
        l2_statistics=1 if level == 2 else 0,
        l4_centroiding=1 if level == 4 else 0,
        compression_scheme=scheme, compression_level=1,
        source_file_type=0, source_header_length=0,
        keep_calibration_data=1, calibration_file_type=0,
        source_data_type=0, target_data_type=0)
    p = InputParams(values)
    assert p.validate()
    merged = {}
    for sub, dev in (("dev", True), ("host", False)):
        d = tmp_path / sub
        d.mkdir()
        w = ReCoDeWriter("lv", dark_data=dark, output_directory=str(d),
                         input_params=p, mode="batch", node_id=0,
                         use_tpu=True, device_entropy=dev,
                         fast_deflate=(scheme == 0))
        w.start()
        w.run(data)
        w.close()
        merged[sub] = merge_parts(str(d), f"lv.rc{level}", 1)
    if scheme == 0:
        # deflate device path is byte-identical to the host fast-deflate
        assert open(merged["dev"], "rb").read() == \
            open(merged["host"], "rb").read()
    # and the container decodes (bitmap reconstruction at least)
    from pyrecode_tpu import oracle

    r = ReCoDeReader(merged["dev"])
    r.open()
    fd = r.get_next_frame()
    assert fd is not None
    r.close()


def test_all_stored_batch_skips_assembly_byte_identical():
    """A batch where EVERY stream is incompressible takes the early
    stored-block path (no assembly kernel run) and must stay byte-identical
    to the native encoder and to zlib round-trip."""
    rng = np.random.default_rng(99)
    raws = [bytes(rng.integers(0, 256, n).astype(np.uint8))
            for n in (5000, pdk.CH_A, 3 * pdk.CH_A - 7)]
    npad = 3 * pdk.CH_A
    streams, lengths = _pack(raws, npad)
    calls = []
    orig = pdk.assemble_pallas

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    pdk.assemble_pallas, spy_saved = spy, orig
    try:
        outs = dd.deflate_batch_device(streams, lengths,
                                       raw_cb=lambda i: raws[i],
                                       interpret=True)
    finally:
        pdk.assemble_pallas = spy_saved
    assert not calls, "assembly kernel ran on an all-stored batch"
    for i, (raw, got) in enumerate(zip(raws, outs)):
        assert got == native.deflate_sparse(raw), i
        assert zlib.decompress(got) == raw, i


def test_quantize_bound_grid():
    ch = pdk.CH_B
    for n in (1, ch - 1, ch, ch + 1, 460_699, 690_000, 1 << 20):
        b = dd.quantize_bound(n, ch)
        assert b >= max(n, ch) and b % ch == 0
        assert b < 1.25 * max(n, ch) + ch  # slack cap
    assert dd.quantize_bound(690_000, ch) == 786_432


def test_split_assembly_identity():
    """The split (parallel scatter + serial concat) assembly variant is
    byte-identical to the one-kernel form (r5 experiment; measured
    neutral on hw, kept as a verified alternative)."""
    import numpy as np
    import jax.numpy as jnp

    from pyrecode_tpu import native
    from pyrecode_tpu.codecs import dyndeflate as dd
    from pyrecode_tpu.ops import pallas_deflate as pdk

    rng = np.random.default_rng(3)
    n = pdk.CH_A - 101
    raw = (rng.integers(0, 256, n)
           * (rng.random(n) < 0.05)).astype(np.uint8).tobytes()
    streams = np.zeros((1, pdk.CH_A), np.uint8)
    streams[0, :n] = np.frombuffer(raw, np.uint8)
    lens = np.array([n], np.int32)
    tok, hist, _ = pdk.tokenize_pallas(jnp.asarray(streams),
                                       jnp.asarray(lens), interpret=True)
    lfreq = np.asarray(hist)[0, :286].astype(np.uint32)
    lfreq[256] += 1
    llen, lcode = native.dyn_tables(lfreq)
    hb, hbits = native.dyn_header(llen)
    luts = dd.luts_as_radix(llen, lcode)[None]
    phase = np.array([hbits % 8], np.int32)
    partial = np.array([int(hb[-1]) if hbits % 8 else 0], np.int32)
    out_bound = 2 * streams.shape[1] + 256
    b1, t1, o1 = pdk.assemble_pallas(
        tok, jnp.asarray(luts), jnp.asarray(phase), jnp.asarray(partial),
        out_bound, interpret=True)
    b2, t2, o2 = pdk.assemble_pallas_split(
        tok, jnp.asarray(luts), jnp.asarray(phase), jnp.asarray(partial),
        out_bound, interpret=True)
    assert np.array_equal(np.asarray(b1), np.asarray(b2))
    assert int(np.asarray(t1)[0]) == int(np.asarray(t2)[0])
    assert not np.asarray(o2).any()
