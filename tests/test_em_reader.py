"""EM source readers on REAL file bytes (native MRC2014/StreamPix parsers).

The reference needs mrcfile/pims for these formats; the native parsers here
read real fixture files with zero third-party dependencies, so the full
MRC/SEQ logic is exercised against actual binary layouts.
"""

import struct
import sys
import types

import numpy as np
import pytest

from pyrecode_tpu.constants import rc_cfg as rc
from pyrecode_tpu.em_reader import (MRCReader, SEQReader, emfile,
                                    parse_mrc_header, parse_seq_header,
                                    write_mrc, write_seq)


@pytest.fixture
def mrc_file(tmp_path):
    data = np.arange(3 * 8 * 8, dtype=np.uint16).reshape(3, 8, 8)
    path = tmp_path / "stack.mrc"
    write_mrc(path, data)
    return str(path), data


@pytest.fixture
def seq_file(tmp_path):
    data = (np.arange(4 * 8 * 8, dtype=np.int16) % 251).reshape(4, 8, 8)
    path = tmp_path / "run.seq"
    write_seq(path, data)
    return str(path), data


class TestMRCReader:
    def test_header_fields(self, mrc_file):
        path, data = mrc_file
        header = parse_mrc_header(open(path, "rb").read(1024))
        assert (header["nx"], header["ny"], header["nz"]) == (8, 8, 3)
        assert header["mode"] == 6 and header["_numpy_dtype"] == np.uint16
        assert header["_data_offset"] == 1024

    def test_protocol(self, mrc_file):
        path, data = mrc_file
        reader = emfile(path, rc.FILE_TYPE_MRC)
        assert isinstance(reader, MRCReader)
        assert reader.shape == (3, 8, 8)
        assert reader.dtype == np.uint16
        assert np.array_equal(np.squeeze(reader[1]), data[1])
        assert np.array_equal(reader[0:2], data[0:2])
        assert len(list(iter(reader))) == 3
        assert reader.get_true_shape() == (3, 8, 8)
        reader.close()

    def test_extended_header_offset(self, tmp_path):
        """nsymbt-sized extended headers shift the data offset."""
        data = np.ones((2, 8, 8), np.int16) * 7
        path = tmp_path / "ext.mrc"
        write_mrc(path, data)
        raw = bytearray(open(path, "rb").read())
        struct.pack_into("<i", raw, 92, 128)  # claim a 128-byte ext header
        open(path, "wb").write(bytes(raw[:1024]) + bytes(128) + bytes(raw[1024:]))
        reader = MRCReader(str(path))
        assert np.array_equal(np.squeeze(reader[1]), data[1])
        reader.close()

    def test_header_serialization(self, mrc_file, tmp_path):
        path, _ = mrc_file
        reader = MRCReader(path)
        out = tmp_path / "hdr.bin"
        with open(out, "wb") as fp:
            reader.serialize_header(fp)
        assert out.stat().st_size == 1024
        assert out.read_bytes()[208:212] == b"MAP "
        reader.close()

    def test_rejects_garbage(self, tmp_path):
        path = tmp_path / "junk.mrc"
        path.write_bytes(b"\xff" * 2048)
        with pytest.raises(ValueError):
            MRCReader(str(path))


class TestSEQReader:
    def test_header_fields(self, seq_file):
        path, _ = seq_file
        header = parse_seq_header(open(path, "rb").read(1024))
        assert header["width"] == 8 and header["height"] == 8
        assert header["bit_depth"] == 16
        assert header["allocated_frames"] == 4
        assert header["_image_offset"] == 8192
        assert header["true_image_size"] == 8 * 8 * 2 + 8

    def test_protocol(self, seq_file):
        path, data = seq_file
        reader = emfile(path, rc.FILE_TYPE_SEQ)
        assert isinstance(reader, SEQReader)
        assert reader.shape == (4, 8, 8)
        assert reader.dtype == np.int16
        assert np.array_equal(np.squeeze(reader[2]), data[2])
        assert np.array_equal(reader[1:3], data[1:3])
        assert reader.get_true_shape() == (4, 8, 8)
        reader.close()

    def test_header_placeholder(self, seq_file, tmp_path):
        path, _ = seq_file
        reader = SEQReader(path)
        out = tmp_path / "hdr.bin"
        with open(out, "wb") as fp:
            reader.serialize_header(fp)
        assert out.stat().st_size == 1024
        reader.close()

    def test_rejects_garbage(self, tmp_path):
        path = tmp_path / "junk.seq"
        path.write_bytes(b"\x00" * 9000)
        with pytest.raises(ValueError):
            SEQReader(str(path))


def test_mrcfile_fallback_used_for_nonstandard(monkeypatch, tmp_path):
    """Files the minimal parser rejects route to mrcfile when installed."""
    data = np.arange(2 * 8 * 8, dtype=np.uint16).reshape(2, 8, 8)
    path = tmp_path / "weird.mrc"
    path.write_bytes(b"\xee" * 1024 + data.tobytes())

    class FakeHeaderRecord:
        dtype = np.dtype([("nx", "<i4"), ("ny", "<i4"), ("nz", "<i4")])

        def __getitem__(self, key):
            return {"nx": 8, "ny": 8, "nz": 2}[key]

    class FakeMrc:
        data_ = data

        def __init__(self):
            self.data = data
            self.header = FakeHeaderRecord()

        def close(self):
            pass

    module = types.ModuleType("mrcfile")
    module.open = lambda p, mode="r", permissive=False: FakeMrc()
    monkeypatch.setitem(sys.modules, "mrcfile", module)

    reader = MRCReader(str(path))
    assert reader.shape == (2, 8, 8)
    assert np.array_equal(np.squeeze(reader[1]), data[1])
    reader.close()


def test_writer_with_mrc_source(mrc_file, tmp_path):
    """Full writer path reading from a real MRC stack (native parser)."""
    from pyrecode_tpu import InputParams
    from pyrecode_tpu.reader import ReCoDeReader, merge_parts
    from pyrecode_tpu.writer import ReCoDeWriter

    path, data = mrc_file
    params = InputParams(dict(
        reduction_level=1, rc_operation_mode=1, calibration_threshold_epsilon=0,
        target_bit_depth=16, source_bit_depth=16, num_cols=8, num_rows=8,
        num_frames=3, frame_offset=0, num_calibration_frames=1,
        calibration_frame_offset=0, keep_part_files=0, num_threads=1,
        l2_statistics=0, l4_centroiding=0, compression_scheme=0,
        compression_level=1, source_file_type=rc.FILE_TYPE_MRC,
        source_header_length=0, keep_calibration_data=1,
        calibration_file_type=0, source_data_type=0, target_data_type=0))
    assert params.validate()

    dark = np.zeros((8, 8), np.uint16)
    w = ReCoDeWriter(path, dark_data=dark, output_directory=str(tmp_path),
                     input_params=params)
    w.start()
    w.run()  # reads from the real MRC file
    w.close()
    merged = merge_parts(str(tmp_path), "stack.rc1", 1)

    reader = ReCoDeReader(merged)
    reader.open()
    # source header (1024 bytes) preserved in the container
    assert reader.get_source_header()[208:212] == b"MAP "
    for i in range(3):
        fd = reader.get_next_frame()
        expected = np.where(data[i] > dark, data[i] - dark, 0)
        assert np.array_equal(fd[i]["data"].todense(), expected), i
    reader.close()


def test_writer_with_seq_source(seq_file, tmp_path):
    """Full writer path reading from a real StreamPix sequence."""
    from pyrecode_tpu import InputParams
    from pyrecode_tpu.reader import ReCoDeReader, merge_parts
    from pyrecode_tpu.writer import ReCoDeWriter

    path, data = seq_file
    params = InputParams(dict(
        reduction_level=1, rc_operation_mode=1, calibration_threshold_epsilon=0,
        target_bit_depth=16, source_bit_depth=16, num_cols=8, num_rows=8,
        num_frames=4, frame_offset=0, num_calibration_frames=1,
        calibration_frame_offset=0, keep_part_files=0, num_threads=1,
        l2_statistics=0, l4_centroiding=0, compression_scheme=0,
        compression_level=1, source_file_type=rc.FILE_TYPE_SEQ,
        source_header_length=0, keep_calibration_data=1,
        calibration_file_type=0, source_data_type=1, target_data_type=1))
    assert params.validate()

    dark = np.zeros((8, 8), np.int16)
    w = ReCoDeWriter(path, dark_data=dark, output_directory=str(tmp_path),
                     input_params=params)
    w.start()
    w.run()
    w.close()
    merged = merge_parts(str(tmp_path), "run.rc1", 1)

    reader = ReCoDeReader(merged)
    reader.open()
    for i in range(4):
        fd = reader.get_next_frame()
        expected = np.where(data[i] > dark, data[i] - dark, 0)
        assert np.array_equal(fd[i]["data"].todense(), expected), i
    reader.close()
