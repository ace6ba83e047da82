"""Randomized end-to-end round-trips across the configuration space.

Each case draws a random reduction level, operation mode, entropy scheme,
geometry, bit depth, density, thread count and threshold, runs the full
writer -> merge -> reader pipeline, and checks the decode against the oracle
(bit-exact for L1; structural for L2/L3/L4).
"""

import numpy as np
import pytest

from pyrecode_tpu import InputParams, codecs, oracle
from pyrecode_tpu.reader import ReCoDeReader, merge_parts
from pyrecode_tpu.writer import ReCoDeWriter


def _random_case(rng):
    level = int(rng.choice([1, 1, 1, 2, 3, 4]))          # L1-weighted
    mode = int(rng.choice([0, 1, 1]))
    scheme = int(rng.choice(codecs.available_schemes()))
    ny = int(rng.choice([32, 64, 96, 128]))
    nx = int(rng.choice([32, 64, 128, 160]))
    nz = int(rng.integers(1, 7))
    bit_depth = int(rng.choice([8, 12, 16] if level != 2 else [12, 16]))
    density = float(rng.choice([0.0, 0.01, 0.05, 0.2]))
    threads = int(rng.integers(1, 4))
    eps = int(rng.choice([0, 0, 5]))
    return dict(level=level, mode=mode, scheme=scheme, ny=ny, nx=nx, nz=nz,
                bit_depth=bit_depth, density=density, threads=threads, eps=eps)


def _run_case(tmp_path, case, seed):
    rng = np.random.default_rng(seed)
    hi = (1 << case["bit_depth"]) - 1
    dtype = np.uint8 if case["bit_depth"] <= 8 else np.uint16
    shape = (case["nz"], case["ny"], case["nx"])
    data = np.where(rng.random(shape) < case["density"],
                    rng.integers(1, hi + 1, shape), 0).astype(dtype)
    dark = rng.integers(0, 3, (case["ny"], case["nx"])).astype(dtype)
    thr = (dark.astype(np.int64) + case["eps"]).astype(dtype)

    params = InputParams(dict(
        reduction_level=case["level"], rc_operation_mode=case["mode"],
        calibration_threshold_epsilon=case["eps"],
        target_bit_depth=case["bit_depth"], source_bit_depth=case["bit_depth"],
        num_cols=case["nx"], num_rows=case["ny"], num_frames=case["nz"],
        frame_offset=0, num_calibration_frames=1, calibration_frame_offset=0,
        keep_part_files=0, num_threads=case["threads"], l2_statistics=2,
        l4_centroiding=0, compression_scheme=case["scheme"],
        compression_level=1, source_file_type=0, source_header_length=0,
        keep_calibration_data=1, calibration_file_type=0, source_data_type=0,
        target_data_type=0))
    assert params.validate()

    name = f"fuzz{seed}"
    for node in range(case["threads"]):
        w = ReCoDeWriter(name, dark_data=dark, output_directory=str(tmp_path),
                         input_params=params, node_id=node)
        w.start()
        w.run(data)
        w.close()
    merged = merge_parts(str(tmp_path), f"{name}.rc{case['level']}", case["threads"])

    reader = ReCoDeReader(merged)
    reader.open()
    for i in range(case["nz"]):
        fd = reader.get_next_frame()
        dense = np.asarray(fd[i]["data"].todense())
        enc = oracle.reduce_frame(data[i], thr, case["level"], case["bit_depth"],
                                  l2_statistic="sum")
        expected_bitmap = oracle.unpack_binary_frame(
            np.frombuffer(enc["packed_binary_map"], np.uint8),
            case["ny"] * case["nx"]).reshape(case["ny"], case["nx"])
        if case["level"] == 1:
            expected = np.where(data[i] > thr, data[i] - thr, 0)
            assert np.array_equal(dense, expected), (case, i)
        else:
            assert np.array_equal(dense.astype(bool), expected_bitmap.astype(bool)), \
                (case, i)
        if case["level"] == 2:
            labels, num = oracle.label_components(data[i] > thr)
            expected_stats = np.minimum(
                oracle.l2_summary_stats(labels, data[i], num, "sum"),
                (1 << case["bit_depth"]) - 1)
            got = fd[i]["summary_stats"]
            assert np.array_equal(got[:num], expected_stats.astype(got.dtype)), (case, i)
    reader.close()


@pytest.mark.parametrize("seed", range(24))
def test_random_config_roundtrip(tmp_path, seed):
    rng = np.random.default_rng(1000 + seed)
    case = _random_case(rng)
    _run_case(tmp_path, case, seed)
