"""EM source readers, driven through stub mrcfile/pims modules.

mrcfile and pims are not installed in CI; these stubs emulate their APIs so
the MRCReader/SEQReader logic (slicing protocol, header serialization,
writer integration) is actually executed.
"""

import sys
import types

import numpy as np
import pytest

from pyrecode_tpu.constants import rc_cfg as rc


@pytest.fixture
def fake_mrcfile(monkeypatch):
    data = np.arange(3 * 8 * 8, dtype=np.uint16).reshape(3, 8, 8)

    class FakeHeaderRecord:
        dtype = np.dtype([("nx", "<i4"), ("ny", "<i4"), ("nz", "<i4")])

        def __init__(self):
            self._values = {"nx": 8, "ny": 8, "nz": 3}

        def __getitem__(self, key):
            return self._values[key]

        def tobytes(self):
            return b"MRCHDR".ljust(1024, b"\x00")

    class FakeMrc:
        def __init__(self):
            self.data = data
            self.header = FakeHeaderRecord()

        def is_image_stack(self):
            return True

        def is_single_image(self):
            return False

        def close(self):
            pass

    module = types.ModuleType("mrcfile")
    module.open = lambda path, mode="r", permissive=False: FakeMrc()
    monkeypatch.setitem(sys.modules, "mrcfile", module)
    return data


@pytest.fixture
def fake_pims(monkeypatch):
    data = np.arange(4 * 8 * 8, dtype=np.int16).reshape(4, 8, 8)

    class FakeStack:
        header_dict = {"allocated_frames": 4, "height": 8, "width": 8,
                       "bit_depth": 16}

        def __getitem__(self, z):
            return data[z]

        def __len__(self):
            return 4

        def close(self):
            pass

    module = types.ModuleType("pims")
    module.open = lambda path: FakeStack()
    monkeypatch.setitem(sys.modules, "pims", module)
    return data


class TestMRCReader:
    def test_protocol(self, fake_mrcfile):
        from pyrecode_tpu.em_reader import MRCReader, emfile

        reader = emfile("whatever.mrc", rc.FILE_TYPE_MRC)
        assert isinstance(reader, MRCReader)
        assert reader.shape == (3, 8, 8)
        assert np.array_equal(np.squeeze(reader[1]), fake_mrcfile[1])
        assert np.array_equal(reader[0:2], fake_mrcfile[0:2])
        frames = list(iter(reader))
        assert len(frames) == 3
        reader.close()

    def test_header_serialization(self, fake_mrcfile, tmp_path):
        from pyrecode_tpu.em_reader import MRCReader

        reader = MRCReader("x.mrc")
        out = tmp_path / "hdr.bin"
        with open(out, "wb") as fp:
            reader.serialize_header(fp)
        assert out.stat().st_size == 1024
        assert out.read_bytes().startswith(b"MRCHDR")


class TestSEQReader:
    def test_protocol(self, fake_pims):
        from pyrecode_tpu.em_reader import SEQReader, emfile

        reader = emfile("run.seq", rc.FILE_TYPE_SEQ)
        assert isinstance(reader, SEQReader)
        assert reader.shape == (4, 8, 8)
        assert reader.dtype == np.int16
        assert np.array_equal(np.squeeze(reader[2]), fake_pims[2])
        sub = reader[1:3]
        assert np.array_equal(sub, fake_pims[1:3])
        assert reader.get_true_shape() == (4, 8, 8)
        reader.close()

    def test_header_placeholder(self, fake_pims, tmp_path):
        from pyrecode_tpu.em_reader import SEQReader

        reader = SEQReader("run.seq")
        out = tmp_path / "hdr.bin"
        with open(out, "wb") as fp:
            reader.serialize_header(fp)
        assert out.stat().st_size == 1024


def test_writer_with_mrc_source(fake_mrcfile, tmp_path):
    """Full writer path reading from an (emulated) MRC stack."""
    from pyrecode_tpu import InputParams
    from pyrecode_tpu.reader import ReCoDeReader, merge_parts
    from pyrecode_tpu.writer import ReCoDeWriter

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
    w = ReCoDeWriter("stack.mrc", dark_data=dark, output_directory=str(tmp_path),
                     input_params=params)
    w.start()
    w.run()  # reads from the fake MRC
    w.close()
    merged = merge_parts(str(tmp_path), "stack.rc1", 1)

    reader = ReCoDeReader(merged)
    reader.open()
    # source header (1024 bytes) preserved in the container
    assert reader.get_source_header().startswith(b"MRCHDR")
    for i in range(3):
        fd = reader.get_next_frame()
        expected = np.where(fake_mrcfile[i] > dark, fake_mrcfile[i] - dark, 0)
        assert np.array_equal(fd[i]["data"].todense(), expected), i
    reader.close()
