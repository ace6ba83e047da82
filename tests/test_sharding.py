"""Mesh/sharded-encode tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

from pyrecode_tpu import oracle
from pyrecode_tpu.parallel import make_codec_mesh, encode_frames_sharded
from pyrecode_tpu.parallel.multihost import (
    gather_ordered_blocks, make_pallas_encode_step, replicate_threshold)


def _frames(batch, shape=(32, 256), density=0.03, seed=0):
    rng = np.random.default_rng(seed)
    return np.where(rng.random((batch, *shape)) < density,
                    rng.integers(1, 4096, (batch, *shape)), 0).astype(np.uint16)


def test_xla_sharded_encode_matches_oracle():
    mesh = make_codec_mesh(4, 2)
    frames = _frames(8)
    thr = np.zeros(frames.shape[1:], np.uint16)
    res = encode_frames_sharded(frames, thr, mesh, reduction_level=1,
                                bit_depth=12, max_values=2048, shard_rows=True)
    for i in (0, 5, 7):
        enc = oracle.reduce_frame(frames[i], thr, 1, 12)
        assert np.asarray(res.bitmap)[i].tobytes() == enc["packed_binary_map"]
        plen = int(np.asarray(res.packed_len)[i])
        assert np.asarray(res.packed)[i][:plen].tobytes() == enc["packed_pixvals"]


def test_shard_map_pallas_encode_and_gather():
    mesh = make_codec_mesh(8, 1)
    frames = _frames(16, seed=2)
    thr = replicate_threshold(np.zeros(frames.shape[1:], np.uint16), mesh)
    step = make_pallas_encode_step(mesh, out_size=1024, bit_depth=12)
    bitmap, packed, counts, ovf = step(frames, thr)
    assert not np.asarray(ovf).any()
    assert "data" in str(bitmap.sharding.spec)

    blocks = gather_ordered_blocks(bitmap, packed, counts, bit_depth=12)
    assert len(blocks) == 16
    for i in (0, 7, 15):  # across shard boundaries: order preserved
        enc = oracle.reduce_frame(frames[i], np.zeros(frames.shape[1:], np.uint16), 1, 12)
        assert blocks[i][0] == enc["packed_binary_map"], i
        assert blocks[i][1] == enc["packed_pixvals"], i
