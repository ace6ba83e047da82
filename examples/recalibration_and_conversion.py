"""Recalibration + offline L1 -> L4 conversion example (counterpart of the
reference's examples/recalibration_and_conversion.py:9-43): encode synthetic
data, decode it, re-threshold against a new dark reference, and convert the
sparse L1 frames to counted centroid (L4) maps — the conversion running as
one batched device program.

Run: python examples/recalibration_and_conversion.py
"""

import sys
import tempfile

import numpy as np

sys.path.insert(0, ".")

from pyrecode_tpu import InitParams, InputParams, ReCoDeServer
from pyrecode_tpu.reader import ReCoDeReader, merge_parts
from pyrecode_tpu.utils.converters import l1_to_l4_converter, recalibrate_l1
from pyrecode_tpu.utils.converters_mt import L1_to_L4_mt


def main():
    out_dir = tempfile.mkdtemp()
    shape = (8, 256, 256)
    rng = np.random.default_rng(1)
    data = (rng.integers(0, 4096, size=shape) - 3600).clip(0).astype(np.uint16)
    dark = np.full(shape[1:], 5, dtype=np.uint16)

    init_params = InitParams("batch", out_dir, image_filename="conv_run")
    input_params = InputParams(dict(
        reduction_level=1, rc_operation_mode=1, calibration_threshold_epsilon=0,
        target_bit_depth=12, source_bit_depth=12, num_cols=shape[2],
        num_rows=shape[1], num_frames=shape[0], frame_offset=0,
        num_calibration_frames=1, calibration_frame_offset=0, keep_part_files=0,
        num_threads=2, l2_statistics=0, l4_centroiding=0, compression_scheme=0,
        compression_level=1, source_file_type=0, source_header_length=0,
        keep_calibration_data=1, calibration_file_type=0, source_data_type=0,
        target_data_type=0))
    input_params.validate()

    ReCoDeServer("batch").run(init_params, input_params, dark_data=dark, data=data)
    merged = merge_parts(out_dir, "conv_run.rc1", 2)

    reader = ReCoDeReader(merged)
    reader.open()
    l1_frames = {}
    for i in range(shape[0]):
        l1_frames.update(reader.get_next_frame())
    reader.close()

    # re-threshold with a stricter dark reference (eps raises the threshold)
    new_dark = np.full(shape[1:], 8, dtype=np.uint16)
    recal = recalibrate_l1(l1_frames, original_calibration_frame=dark,
                           new_calibration_frame=new_dark, epsilon=2)
    n_before = sum(f["data"].nnz for f in l1_frames.values())
    n_after = sum(f["data"].nnz for f in recal.values())
    print(f"recalibration: {n_before} -> {n_after} foreground pixels")

    # L1 -> L4: counted centroids, per-frame and device-batched
    l4 = l1_to_l4_converter(recal, shape[1:], method="weighted_average")
    l4_mt = L1_to_L4_mt(recal, shape[1:], n_workers=2)
    same = all(
        np.array_equal(np.asarray(l4[i]["data"].todense()),
                       np.asarray(l4_mt[i]["data"].todense()))
        for i in l4)
    print("per-frame vs batched L1->L4 agree:", same)
    print("events in frame 0:", l4[0]["data"].nnz)


if __name__ == "__main__":
    main()
