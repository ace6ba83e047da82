"""Live-view example (counterpart of the reference's ReCoDe_Live_View
notebooks): watch intermediate part files while a stream-mode acquisition is
still running and accumulate fractionated views.

Run: python examples/live_view.py
"""

import sys
import tempfile
import threading
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, ".")

from pyrecode_tpu import InitParams, InputParams, ReCoDeServer
from pyrecode_tpu.utils.viewer import ReCoDeViewer


def main():
    tmp = Path(tempfile.mkdtemp())
    watch = tmp / "acq"
    out = tmp / "out"
    watch.mkdir()
    out.mkdir()

    shape_chunk = (4, 128, 128)
    rng = np.random.default_rng(2)
    chunks = [
        (rng.integers(0, 4096, size=shape_chunk) - 3500).clip(0).astype(np.uint16)
        for _ in range(3)
    ]
    dark = np.zeros(shape_chunk[1:], dtype=np.uint16)

    init_params = InitParams(
        "stream", str(out), image_filename="ignored", directory_path=str(watch),
        log_filename=str(tmp / "recode.log"), run_name="live", verbosity=0,
        max_count=3, chunk_time_in_sec=1)
    input_params = InputParams(dict(
        reduction_level=1, rc_operation_mode=1, calibration_threshold_epsilon=0,
        target_bit_depth=12, source_bit_depth=12, num_cols=shape_chunk[2],
        num_rows=shape_chunk[1], num_frames=shape_chunk[0], frame_offset=0,
        num_calibration_frames=1, calibration_frame_offset=0, keep_part_files=0,
        num_threads=2, l2_statistics=0, l4_centroiding=0, compression_scheme=0,
        compression_level=1, source_file_type=0, source_header_length=0,
        keep_calibration_data=1, calibration_file_type=0, source_data_type=0,
        target_data_type=0))
    input_params.validate()

    # acquisition: drop chunk files over time while the server consumes them
    def feed():
        for index, chunk in enumerate(chunks):
            (watch / f"chunk_{index:03d}.seq").write_bytes(chunk.tobytes())
            time.sleep(0.3)

    feeder = threading.Thread(target=feed)
    feeder.start()
    server_thread = threading.Thread(
        target=lambda: ReCoDeServer("stream").run(init_params, input_params,
                                                  dark_data=dark))
    server_thread.start()

    # live viewing: poll the part files as they grow
    time.sleep(1.0)
    viewer = ReCoDeViewer(str(out), "live.rc1", 2, fractionation=4)
    views = []
    deadline = time.time() + 20
    while len(views) < 3 and time.time() < deadline:
        view = viewer.get_next_view()
        if view["n_frames"]:
            views.append(view)
            print(f"view @{view['start']}: {view['n_frames']} frames, "
                  f"total dose {view['view'].sum():.0f}")
        else:
            time.sleep(0.2)
    viewer.close()
    feeder.join()
    server_thread.join()

    expected = np.concatenate(chunks).astype(np.float64)
    got = sum(v["view"] for v in views)
    print("live view total equals stream total:",
          np.array_equal(got, expected.sum(axis=0)))


if __name__ == "__main__":
    main()
