"""Multi-process data plane: jax.distributed on 2 localhost CPU processes.

The reference's unit of distribution is N OS processes writing part files
(recode_server.py:350-363).  Here the equivalent cross-process path —
shard_map'd device encode + process_allgather + process-0 container
assembly (parallel/multihost.py) — is executed for real on a 2-process
jax.distributed runtime (4 virtual CPU devices each, 8-device global mesh)
and byte-compared against the single-process result.
"""

import os
import pickle
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = str(Path(__file__).resolve().parent.parent)

_WORKER = """
import os, pickle, sys

proc_id, nprocs, port, outdir = (
    int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4])
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address="127.0.0.1:" + port,
                           num_processes=nprocs, process_id=proc_id)
import numpy as np
from jax.experimental import multihost_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from pyrecode_tpu.parallel import multihost

assert jax.process_count() == nprocs
assert len(jax.devices()) == 4 * nprocs

rng = np.random.default_rng(0)
frames = (rng.integers(0, 4096, (8, 64, 128)).astype(np.int64) - 3500)
frames = frames.clip(0).astype(np.uint16)
thr = np.zeros((64, 128), np.uint16)

mesh = Mesh(np.array(jax.devices()), ("data",))
sharding = NamedSharding(mesh, P("data", None, None))
garr = jax.make_array_from_callback(frames.shape, sharding,
                                    lambda idx: frames[idx])
thr_g = multihost.replicate_threshold(thr, mesh)
step = multihost.make_pallas_encode_step(mesh, out_size=2048, bucket=1,
                                         bit_depth=12)
bitmap, packed, counts, ovf = step(garr, thr_g)
assert not bool(np.any(multihost_utils.process_allgather(ovf, tiled=True)))
blocks = multihost.gather_ordered_blocks(bitmap, packed, counts, 12)
if proc_id == 0:
    assert blocks is not None
    with open(os.path.join(outdir, "blocks.pkl"), "wb") as fp:
        pickle.dump(blocks, fp)
else:
    assert blocks is None
jax.distributed.shutdown()
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_gather_matches_single_process(tmp_path):
    port = str(_free_port())
    script = tmp_path / "worker.py"
    script.write_text(_WORKER.format(repo=REPO))

    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid), "2", port, str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for pid in (0, 1)
    ]
    outs = [p.communicate(timeout=240)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out.decode(errors="replace")[-3000:]

    with open(tmp_path / "blocks.pkl", "rb") as fp:
        blocks = pickle.load(fp)

    # single-process ground truth: the numpy oracle on the same fixture
    from pyrecode_tpu import oracle

    rng = np.random.default_rng(0)
    frames = (rng.integers(0, 4096, (8, 64, 128)).astype(np.int64) - 3500)
    frames = frames.clip(0).astype(np.uint16)
    thr = np.zeros((64, 128), np.uint16)
    assert len(blocks) == 8
    for i in range(8):
        enc = oracle.reduce_frame(frames[i], thr, 1, 12)
        assert blocks[i][0] == enc["packed_binary_map"], i
        assert blocks[i][1] == enc["packed_pixvals"], i
