"""Minimal acquisition-server example (counterpart of the reference's
examples/recode_server.py): encode a synthetic sparse stack with 3 nodes,
merge the parts, and verify the round trip.

Run: python examples/recode_server.py [output_dir]
"""

import sys
import tempfile

import numpy as np

sys.path.insert(0, ".")

from pyrecode_tpu import InitParams, InputParams, ReCoDeServer
from pyrecode_tpu.reader import ReCoDeReader, merge_parts


def main(out_dir):
    import os

    os.makedirs(out_dir, exist_ok=True)
    shape = (9, 512, 512)
    rng = np.random.default_rng(0)
    data = (rng.integers(0, 4096, size=shape) - 3500).clip(0).astype(np.uint16)
    dark = np.zeros(shape[1:], dtype=np.uint16)

    init_params = InitParams("batch", out_dir, image_filename="example_run",
                             validation_frame_gap=4, verbosity=1,
                             log_filename=f"{out_dir}/recode.log")
    input_params = InputParams(dict(
        reduction_level=1, rc_operation_mode=1, calibration_threshold_epsilon=0,
        target_bit_depth=12, source_bit_depth=12, num_cols=shape[2],
        num_rows=shape[1], num_frames=shape[0], frame_offset=0,
        num_calibration_frames=1, calibration_frame_offset=0, keep_part_files=0,
        num_threads=3, l2_statistics=0, l4_centroiding=0, compression_scheme=0,
        compression_level=1, source_file_type=0, source_header_length=0,
        keep_calibration_data=1, calibration_file_type=0, source_data_type=0,
        target_data_type=0))
    input_params.validate()

    metrics = ReCoDeServer("batch").run(init_params, input_params,
                                        dark_data=dark, data=data)
    print({node: m.get("run_frames") for node, m in metrics.items()})

    merged = merge_parts(out_dir, "example_run.rc1", 3)
    reader = ReCoDeReader(merged)
    reader.open()
    ok = all(
        np.array_equal(reader.get_next_frame()[i]["data"].todense(), data[i])
        for i in range(shape[0]))
    reader.close()
    print("round trip exact:", ok)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp())
