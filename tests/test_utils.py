"""Tools layer tests: calibration, converters, viewer."""

import numpy as np
import pytest

from pyrecode_tpu import InputParams, oracle
from pyrecode_tpu.reader import ReCoDeReader, merge_parts
from pyrecode_tpu.utils import calibration, converters, converters_mt
from pyrecode_tpu.utils.viewer import ReCoDeViewer, ReCoDeViewerMT
from pyrecode_tpu.writer import ReCoDeWriter


def _decoded_l1_frames(n=6, shape=(64, 64), seed=0):
    rng = np.random.default_rng(seed)
    data = rng.integers(0, 4096, size=(n, *shape)).astype(np.int64) - 3600
    data[data < 0] = 0
    data = data.astype(np.uint16)
    frames = {}
    from scipy.sparse import coo_matrix

    for i in range(n):
        frames[i] = {"metadata": {"frame_id": i}, "data": coo_matrix(data[i])}
    return frames, data


class TestCalibration:
    def test_median_std(self):
        rng = np.random.default_rng(1)
        frames = rng.normal(100, 5, size=(50, 32, 32)).astype(np.float32)
        med, std = calibration.pixel_median_std(frames)
        np.testing.assert_allclose(med, np.median(frames, axis=0), atol=1e-3)
        np.testing.assert_allclose(std, np.std(frames, axis=0), atol=1e-3)

    def test_make_calibration_frames(self, tmp_path):
        rng = np.random.default_rng(2)
        frames = rng.normal(100, 4, size=(40, 32, 32)).clip(0).astype(np.uint16)
        result = calibration.make_calibration_frames(
            None, np.uint16, nFrames=40, n_stats_frames=10, n_sigmas=3,
            savepath=str(tmp_path), filename_prefix="cal", frames=frames,
            verbose=False)
        assert result["sigma"] > 0
        assert set(result["thresholds"].keys()) == {0, 1, 2}
        # higher sigma -> fewer foreground pixels
        fracs = [result["statistics"][i]["avg_foreground_fraction"] for i in range(3)]
        assert fracs[0] >= fracs[1] >= fracs[2]
        assert (tmp_path / "cal__dark_ref_0.bin").exists()

    def test_accurate_thresholds(self):
        rng = np.random.default_rng(3)
        frames = rng.normal(100, 4, size=(30, 16, 16)).astype(np.float32)
        base = np.median(frames, axis=0).astype(np.float32)
        acc = calibration.accurate_pixel_thresholds(frames, base, expected_n_events=3)
        assert acc.shape == (16, 16)
        assert (acc >= base - 1e-3).all()


class TestConverters:
    def test_recalibrate_identity(self):
        frames, data = _decoded_l1_frames()
        cal = np.full((64, 64), 10, dtype=np.uint16)
        out = converters.recalibrate_l1(
            frames, original_calibration_frame=cal, new_calibration_frame=cal)
        for i in range(len(data)):
            assert np.array_equal(np.asarray(out[i]["data"].todense()), data[i])

    def test_recalibrate_shift(self):
        frames, data = _decoded_l1_frames(seed=4)
        old = np.full((64, 64), 20, dtype=np.uint16)
        new = np.full((64, 64), 25, dtype=np.uint16)  # higher threshold -> -5
        out = converters.recalibrate_l1(
            frames, original_calibration_frame=old, new_calibration_frame=new)
        for i in range(len(data)):
            expected = np.where(data[i] > 0,
                                np.clip(data[i].astype(np.int64) - 5, 0, None),
                                0).astype(np.uint16)
            assert np.array_equal(np.asarray(out[i]["data"].todense()), expected)

    def test_l1_to_l4_matches_oracle(self):
        frames, data = _decoded_l1_frames(seed=5)
        out = converters.l1_to_l4_converter(frames, (64, 64))
        for i in range(len(data)):
            labels, num = oracle.label_components(data[i] > 0)
            cents = np.round(oracle.l4_centroids(labels, data[i], num)).astype(int)
            got = np.asarray(out[i]["data"].todense())
            assert got.sum() == len(np.unique(cents, axis=0))
            for r, c in cents:
                assert got[r, c]

    def test_l1_to_l4_batch_device(self):
        _, data = _decoded_l1_frames(seed=6)
        cmasks = converters.l1_to_l4_batch(data)
        enc = oracle.reduce_frame(data[0], np.zeros_like(data[0]), 4, 12)
        expected = oracle.unpack_binary_frame(
            np.frombuffer(enc["packed_binary_map"], np.uint8), 64 * 64).reshape(64, 64)
        assert np.array_equal(cmasks[0].astype(bool), expected.astype(bool))

    def test_l1_to_l4_mt(self):
        frames, data = _decoded_l1_frames(n=8, seed=7)
        single = converters_mt.L1_to_L4(frames, (64, 64))
        multi = converters_mt.L1_to_L4_mt(frames, (64, 64), n_workers=3)
        assert sorted(single.keys()) == sorted(multi.keys()) == list(range(8))
        for i in range(8):
            a = np.asarray(single[i]["data"].todense())
            b = np.asarray(multi[i]["data"].todense())
            assert np.array_equal(a, b)

    def test_de16_common_mode(self):
        rng = np.random.default_rng(8)
        frame = rng.integers(100, 200, size=(16, 512)).astype(np.uint16)
        out = converters.apply_DE16_common_mode_correction(frame)
        assert abs(np.median(out[:, 0:256:2])) < 1.0
        assert abs(np.median(out[:, 257:512:2])) < 1.0

    def test_read_dark_ref(self, tmp_path):
        ref = np.arange(64, dtype=np.uint16).reshape(8, 8)
        path = tmp_path / "dark.bin"
        path.write_bytes(ref.tobytes())
        out = converters.read_dark_ref(str(path), (8, 8), np.uint16)
        assert np.array_equal(out, ref)


class TestViewer:
    def test_live_view_sums_frames(self, tmp_path):
        rng = np.random.default_rng(9)
        data = rng.integers(0, 4096, size=(6, 64, 64)).astype(np.int64) - 3500
        data[data < 0] = 0
        data = data.astype(np.uint16)
        dark = np.zeros((64, 64), np.uint16)
        params = InputParams(dict(
            reduction_level=1, rc_operation_mode=1, calibration_threshold_epsilon=0,
            target_bit_depth=12, source_bit_depth=12, num_cols=64, num_rows=64,
            num_frames=6, frame_offset=0, num_calibration_frames=1,
            calibration_frame_offset=0, keep_part_files=0, num_threads=2,
            l2_statistics=0, l4_centroiding=0, compression_scheme=0,
            compression_level=1, source_file_type=0, source_header_length=0,
            keep_calibration_data=1, calibration_file_type=0, source_data_type=0,
            target_data_type=0))
        assert params.validate()
        for node_id in range(2):
            w = ReCoDeWriter("view_data", dark_data=dark, output_directory=str(tmp_path),
                             input_params=params, node_id=node_id)
            w.start()
            w.run(data)
            w.close()

        viewer = ReCoDeViewer(str(tmp_path), "view_data.rc1", 2, fractionation=3)
        v1 = viewer.get_next_view()
        assert v1["start"] == 0 and v1["n_frames"] == 3
        assert np.array_equal(v1["view"], data[:3].sum(axis=0).astype(np.float64))
        v2 = viewer.get_next_view()
        assert np.array_equal(v2["view"], data[3:6].sum(axis=0).astype(np.float64))
        viewer.close()

    def test_live_view_mt_threads_per_part(self, tmp_path):
        """Threaded variant: one reader thread per part (the reference's MT
        notebook uses one process per part)."""
        rng = np.random.default_rng(10)
        data = rng.integers(0, 4096, size=(6, 64, 64)).astype(np.int64) - 3500
        data[data < 0] = 0
        data = data.astype(np.uint16)
        dark = np.zeros((64, 64), np.uint16)
        params = InputParams(dict(
            reduction_level=1, rc_operation_mode=1, calibration_threshold_epsilon=0,
            target_bit_depth=12, source_bit_depth=12, num_cols=64, num_rows=64,
            num_frames=6, frame_offset=0, num_calibration_frames=1,
            calibration_frame_offset=0, keep_part_files=0, num_threads=2,
            l2_statistics=0, l4_centroiding=0, compression_scheme=0,
            compression_level=1, source_file_type=0, source_header_length=0,
            keep_calibration_data=1, calibration_file_type=0, source_data_type=0,
            target_data_type=0))
        assert params.validate()
        for node_id in range(2):
            w = ReCoDeWriter("mt_data", dark_data=dark, output_directory=str(tmp_path),
                             input_params=params, node_id=node_id)
            w.start()
            w.run(data)
            w.close()

        viewer = ReCoDeViewerMT(str(tmp_path), "mt_data.rc1", 2, fractionation=3)
        v1 = viewer.get_next_view(timeout=10)
        assert v1["start"] == 0 and v1["n_frames"] == 3
        assert np.array_equal(v1["view"], data[:3].sum(axis=0).astype(np.float64))
        v2 = viewer.get_next_view(timeout=10)
        assert np.array_equal(v2["view"], data[3:6].sum(axis=0).astype(np.float64))
        viewer.close()


class TestValidationFrames:
    def test_verify_against_validation_frames(self, tmp_path):
        from pyrecode_tpu.reader import merge_parts
        from pyrecode_tpu.utils.validate import verify_against_validation_frames

        rng = np.random.default_rng(20)
        data = np.where(rng.random((6, 64, 64)) < 0.05,
                        rng.integers(1, 4096, (6, 64, 64)), 0).astype(np.uint16)
        dark = np.zeros((64, 64), np.uint16)
        params = InputParams(dict(
            reduction_level=1, rc_operation_mode=1, calibration_threshold_epsilon=0,
            target_bit_depth=12, source_bit_depth=12, num_cols=64, num_rows=64,
            num_frames=6, frame_offset=0, num_calibration_frames=1,
            calibration_frame_offset=0, keep_part_files=0, num_threads=1,
            l2_statistics=0, l4_centroiding=0, compression_scheme=0,
            compression_level=1, source_file_type=0, source_header_length=0,
            keep_calibration_data=1, calibration_file_type=0, source_data_type=0,
            target_data_type=0))
        assert params.validate()
        w = ReCoDeWriter("val_data", dark_data=dark, output_directory=str(tmp_path),
                         input_params=params, validation_frame_gap=2)
        w.start()
        w.run(data)
        w.close()
        merge_parts(str(tmp_path), "val_data.rc1", 1)

        report = verify_against_validation_frames(
            str(tmp_path / "val_data.rc1"),
            str(tmp_path / "val_data_part000_validation_frames.bin"),
            validation_frame_gap=2, dark=dark)
        assert report["all_match"]
        assert set(report["frames"].keys()) == {0, 2, 4}

        # corrupt one validation frame -> mismatch detected
        vf = tmp_path / "val_data_part000_validation_frames.bin"
        raw = bytearray(vf.read_bytes())
        raw[100] ^= 0xFF
        vf.write_bytes(bytes(raw))
        report2 = verify_against_validation_frames(
            str(tmp_path / "val_data.rc1"), str(vf),
            validation_frame_gap=2, dark=dark)
        assert not report2["all_match"]
