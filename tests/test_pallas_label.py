"""Fused L2/L4 labeling kernel vs oracle (interpret mode on CPU)."""

import numpy as np
import pytest

from pyrecode_tpu import oracle
from pyrecode_tpu.ops import encode_frames_auto
from pyrecode_tpu.ops.pallas_label import encode_l2l4_pallas


def _frames(batch=2, shape=(128, 128), density=0.03, seed=0):
    rng = np.random.default_rng(seed)
    return np.where(rng.random((batch, *shape)) < density,
                    rng.integers(1, 4096, (batch, *shape)), 0).astype(np.uint16)


def _check_l2(frames, thr, bitmap, stats, counts, statistic):
    for i in range(frames.shape[0]):
        enc = oracle.reduce_frame(frames[i], thr, 2, 12, l2_statistic=statistic)
        assert np.asarray(bitmap)[i].tobytes() == enc["packed_binary_map"], i
        labels, num = oracle.label_components(frames[i] > thr)
        # stats are over RAW frame values, not residuals (reference
        # recode_writer.py:446 passes `frame`; oracle.reduce_frame agrees),
        # saturated at the declared bit depth exactly like
        # oracle.reduce_frame clamps before bit-packing
        exp = np.minimum(oracle.l2_summary_stats(labels, frames[i], num,
                                                 statistic), 4095)
        n = int(np.asarray(counts)[i])
        assert n == num, (i, n, num)
        assert np.array_equal(np.asarray(stats)[i][:n], exp.astype(np.int64)), i


@pytest.mark.parametrize("statistic", ["max", "sum"])
def test_l2_matches_oracle(statistic):
    frames = _frames()
    thr = np.zeros(frames.shape[1:], np.uint16)
    bitmap, stats, counts, ovf = encode_l2l4_pallas(
        frames, thr, 2, out_size=1024, bit_depth=12, statistic=statistic,
        interpret=True)
    assert not np.asarray(ovf).any()
    _check_l2(frames, np.zeros(frames.shape[1:], np.uint16), bitmap, stats, counts, statistic)


def test_l2_nonzero_threshold_quick():
    """Nonzero per-pixel threshold, no escalation (K=3 handles 1%)."""
    frames = _frames(seed=5, density=0.01)
    rng = np.random.default_rng(6)
    thr = rng.integers(0, 64, size=frames.shape[1:]).astype(np.uint16)
    bitmap, stats, counts, ovf = encode_l2l4_pallas(
        frames, thr, 2, out_size=1024, bit_depth=12, statistic="sum",
        halo_bucket=0, interpret=True)
    assert not np.asarray(ovf).any()
    _check_l2(frames, thr, bitmap, stats, counts, "sum")


@pytest.mark.slow  # K=8 interpret build ~30 s; hw gate covers L2 at 5%
def test_l2_nonzero_threshold():
    # 5% density grows accidental chains past the first halo bucket (K=3):
    # escalate exactly like the production loop (ops/encode.py) does
    frames = _frames(seed=3, density=0.05)
    rng = np.random.default_rng(4)
    thr = rng.integers(0, 64, size=frames.shape[1:]).astype(np.uint16)
    from pyrecode_tpu.ops.pallas_label import HALO_BUCKETS
    for hb in range(len(HALO_BUCKETS)):
        bitmap, stats, counts, ovf = encode_l2l4_pallas(
            frames, thr, 2, out_size=2048, bit_depth=12, statistic="sum",
            halo_bucket=hb, interpret=True)
        if not np.asarray(ovf).any():
            break
    assert not np.asarray(ovf).any()
    for i in range(frames.shape[0]):
        enc = oracle.reduce_frame(frames[i], thr, 2, 12, l2_statistic="sum")
        assert np.asarray(bitmap)[i].tobytes() == enc["packed_binary_map"], i
        plen = (int(np.asarray(counts)[i]) * 12 + 7) // 8
        from pyrecode_tpu.ops import bitpack_values
        packed = np.asarray(bitpack_values(np.asarray(stats).astype(np.uint32), 12))
        assert packed[i][:plen].tobytes() == enc["packed_pixvals"], i


@pytest.mark.parametrize("scheme", ["weighted_average", "unweighted", "max"])
def test_l4_matches_oracle(scheme):
    frames = _frames(seed=5)
    thr = np.zeros(frames.shape[1:], np.uint16)
    bitmap, stats, counts, ovf = encode_l2l4_pallas(
        frames, thr, 4, out_size=1024, bit_depth=12, scheme=scheme,
        interpret=True)
    assert stats is None
    assert not np.asarray(ovf).any()
    for i in range(frames.shape[0]):
        enc = oracle.reduce_frame(frames[i], thr, 4, 12, l4_scheme=scheme)
        assert np.asarray(bitmap)[i].tobytes() == enc["packed_binary_map"], (scheme, i)


@pytest.mark.slow  # ~30 s interpret; line-puddle test covers flag+fallback
def test_big_puddle_overflows_small_halo():
    frames = np.zeros((1, 32, 128), np.uint16)
    frames[0, 4:28, 20:25] = 100  # 24 rows tall: geodesic radius > 8
    thr = np.zeros((32, 128), np.uint16)
    _, _, _, ovf0 = encode_l2l4_pallas(frames, thr, 2, out_size=128,
                                       bit_depth=12, halo_bucket=0, interpret=True)
    assert np.asarray(ovf0).any()
    # auto path falls back to XLA and still matches the oracle
    res = encode_frames_auto(frames, thr, reduction_level=2, bit_depth=12,
                             max_values=1024)
    enc = oracle.reduce_frame(frames[0], thr, 2, 12)
    assert np.asarray(res.bitmap)[0].tobytes() == enc["packed_binary_map"]
    plen = int(np.asarray(res.packed_len)[0])
    assert np.asarray(res.packed)[0][:plen].tobytes() == enc["packed_pixvals"]


@pytest.mark.parametrize("length", [
    pytest.param(6, marks=pytest.mark.slow),   # same kernel build as 12;
    12,                                        # one length in default tier
])
@pytest.mark.parametrize("lvl,stat,scheme", [
    # the overflow flag is computed BEFORE the mode-specific stats, so one
    # L2 and one L4 mode cover the semantics; the other modes only re-pay
    # interpret-mode kernel builds (~1 min) and run in the slow tier
    (2, "sum", "weighted_average"),
    pytest.param(2, "max", "weighted_average", marks=pytest.mark.slow),
    pytest.param(4, "max", "weighted_average", marks=pytest.mark.slow),
    (4, "max", "unweighted"),
])
def test_line_puddle_flags_chebyshev_overflow(length, lvl, stat, scheme):
    """A straight-line puddle can converge labels (geodesic radius <= T)
    while exceeding the +-K stats window (Chebyshev distance > K).  The
    kernel must flag overflow so the caller escalates; the auto path must
    stay byte-exact via escalation / XLA fallback."""
    frames = np.zeros((1, 64, 128), np.uint16)
    frames[0, 10, 10:10 + length] = np.arange(5, 5 + length, dtype=np.uint16)
    thr = np.zeros((64, 128), np.uint16)

    _, _, _, ovf0 = encode_l2l4_pallas(
        frames, thr, lvl, out_size=128, bit_depth=12, statistic=stat,
        scheme=scheme, halo_bucket=0, interpret=True)
    assert np.asarray(ovf0).any(), "K=4 bucket must flag the line puddle"

    res = encode_frames_auto(frames, thr, reduction_level=lvl, bit_depth=12,
                             max_values=1024, l2_statistic=stat,
                             l4_scheme=scheme)
    enc = oracle.reduce_frame(frames[0], thr, lvl, 12, l2_statistic=stat,
                              l4_scheme=scheme)
    assert np.asarray(res.bitmap)[0].tobytes() == enc["packed_binary_map"]
    if lvl == 2:
        plen = int(np.asarray(res.packed_len)[0])
        assert np.asarray(res.packed)[0][:plen].tobytes() == enc["packed_pixvals"]


def test_auto_uses_label_kernel_and_matches():
    frames = _frames(seed=7, shape=(64, 128))
    thr = np.zeros(frames.shape[1:], np.uint16)
    res = encode_frames_auto(frames, thr, reduction_level=4, bit_depth=12,
                             max_values=1024)
    for i in range(frames.shape[0]):
        enc = oracle.reduce_frame(frames[i], thr, 4, 12)
        assert np.asarray(res.bitmap)[i].tobytes() == enc["packed_binary_map"], i
