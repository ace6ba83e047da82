"""Oracle codec tests: bit-level semantics of packing, reduction, decode."""

import numpy as np
import pytest

from pyrecode_tpu import oracle


def _reference_bit_pack(values, bit_depth):
    """Direct transcription of the packing *spec* (LSB-first bitstream)."""
    n_packed = -(-len(values) * bit_depth // 8)
    packed = np.zeros(n_packed, dtype=np.uint8)
    bit = 0
    for v in values:
        for i in range(bit_depth):
            if int(v) & (1 << i):
                packed[bit // 8] |= 1 << (bit % 8)
            bit += 1
    return packed


def _reference_pack_binary(flat_bits):
    n_bytes = -(-len(flat_bits) // 8)
    out = np.zeros(n_bytes, dtype=np.uint8)
    for k, b in enumerate(flat_bits):
        if b:
            out[k // 8] |= 1 << (k % 8)
    return out


class TestBitPack:
    @pytest.mark.parametrize("bit_depth", [1, 3, 4, 7, 8, 11, 12, 13, 16])
    def test_matches_spec(self, bit_depth):
        rng = np.random.default_rng(0)
        vals = rng.integers(0, 1 << bit_depth, size=137, dtype=np.uint16)
        assert np.array_equal(oracle.bit_pack(vals, bit_depth), _reference_bit_pack(vals, bit_depth))

    @pytest.mark.parametrize("bit_depth", [4, 11, 12, 16])
    def test_roundtrip(self, bit_depth):
        rng = np.random.default_rng(1)
        vals = rng.integers(0, 1 << bit_depth, size=251, dtype=np.uint16)
        packed = oracle.bit_pack(vals, bit_depth)
        out = oracle.bit_unpack(packed, bit_depth, vals.size, dtype=np.uint16)
        assert np.array_equal(out, vals)

    def test_empty(self):
        assert oracle.bit_pack(np.zeros(0, dtype=np.uint16), 12).size == 0
        assert oracle.bit_unpack(b"", 12, 0).size == 0


class TestBinaryMap:
    def test_matches_spec(self):
        rng = np.random.default_rng(2)
        frame = rng.random((16, 16)) > 0.7
        ours = oracle.pack_binary_frame(frame)
        assert np.array_equal(ours, _reference_pack_binary(frame.reshape(-1)))

    def test_roundtrip(self):
        rng = np.random.default_rng(3)
        frame = rng.random((32, 24)) > 0.9
        packed = oracle.pack_binary_frame(frame)
        out = oracle.unpack_binary_frame(packed, frame.size)
        assert np.array_equal(out.astype(bool), frame.reshape(-1))

    def test_non_multiple_of_8(self):
        frame = np.zeros(13, dtype=bool)
        frame[12] = True
        packed = oracle.pack_binary_frame(frame)
        assert packed.size == 2
        assert packed[1] == 0b10000


class TestReduction:
    def _sparse_frame(self, seed=0, shape=(64, 64)):
        rng = np.random.default_rng(seed)
        frame = rng.integers(0, 4096, size=shape).astype(np.int64) - 3500
        frame[frame < 0] = 0
        return frame.astype(np.uint16)

    def test_l1_roundtrip(self):
        frame = self._sparse_frame()
        thr = np.zeros_like(frame)
        enc = oracle.reduce_frame(frame, thr, reduction_level=1, bit_depth=12)
        rows, cols, vals = oracle.decode_frame_sparse(
            enc["packed_binary_map"], enc["packed_pixvals"], 64, 64, 12, 1)
        dense = np.zeros_like(frame)
        dense[rows.astype(int), cols.astype(int)] = vals
        assert np.array_equal(dense, frame)

    def test_l1_nonzero_threshold(self):
        frame = self._sparse_frame(seed=5)
        rng = np.random.default_rng(6)
        dark = rng.integers(0, 100, size=frame.shape).astype(np.uint16)
        thr = dark  # dark + eps with eps=0
        enc = oracle.reduce_frame(frame, thr, reduction_level=1, bit_depth=12)
        rows, cols, vals = oracle.decode_frame_sparse(
            enc["packed_binary_map"], enc["packed_pixvals"], 64, 64, 12, 1)
        mask = frame > thr
        expected = (frame - thr)[mask]
        assert np.array_equal(vals, expected.astype(np.uint64).astype(np.uint16))

    def test_l3_is_bitmap_only(self):
        frame = self._sparse_frame(seed=7)
        thr = np.zeros_like(frame)
        enc = oracle.reduce_frame(frame, thr, reduction_level=3, bit_depth=12)
        assert enc["packed_pixvals"] is None
        rows, cols, vals = oracle.decode_frame_sparse(
            enc["packed_binary_map"], None, 64, 64, 12, 3)
        assert np.array_equal(np.asarray(vals), np.ones(rows.size, dtype=np.uint16))
        idx = rows.astype(int) * 64 + cols.astype(int)
        assert np.array_equal(np.sort(idx), np.flatnonzero(frame > 0))

    def test_l2_summary_stats(self):
        frame = np.zeros((8, 8), dtype=np.uint16)
        # two puddles: one 2x2 block, one single pixel
        frame[1:3, 1:3] = [[10, 20], [30, 40]]
        frame[6, 6] = 99
        thr = np.zeros_like(frame)
        labels, num = oracle.label_components(frame > thr)
        assert num == 2
        stats_max = oracle.l2_summary_stats(labels, frame, num, "max")
        assert np.array_equal(stats_max, [40, 99])
        stats_sum = oracle.l2_summary_stats(labels, frame, num, "sum")
        assert np.array_equal(stats_sum, [100, 99])

    def test_l2_sum_clips_at_dtype_max(self):
        frame = np.full((4, 4), 60000, dtype=np.uint16)
        labels, num = oracle.label_components(frame > 0)
        stats = oracle.l2_summary_stats(labels, frame, num, "sum")
        assert stats[0] == np.iinfo(np.uint16).max

    def test_l4_centroids(self):
        frame = np.zeros((8, 8), dtype=np.uint16)
        frame[2, 2] = 1
        frame[2, 3] = 3  # weighted centroid pulled toward col 3
        thr = np.zeros_like(frame)
        labels, num = oracle.label_components(frame > thr)
        w = oracle.l4_centroids(labels, frame, num, "weighted_average")
        assert w.shape == (1, 2)
        assert np.isclose(w[0, 0], 2.0)
        assert np.isclose(w[0, 1], (2 * 1 + 3 * 3) / 4)
        u = oracle.l4_centroids(labels, frame, num, "unweighted")
        assert np.isclose(u[0, 1], 2.5)
        m = oracle.l4_centroids(labels, frame, num, "max")
        assert m[0, 1] == 3

    def test_l4_binary_map(self):
        cents = np.array([[2.4, 3.6], [0.0, 0.0]])
        bm = oracle.centroids_to_binary_map(cents, 8, 8)
        assert bm[2, 4] and bm[0, 0]
        assert bm.sum() == 2

    def test_label_order_is_raster_scan(self):
        mask = np.zeros((6, 6), dtype=bool)
        mask[0, 5] = True   # first encountered
        mask[3, 0] = True   # second
        labels, num = oracle.label_components(mask)
        assert num == 2
        assert labels[0, 5] == 1
        assert labels[3, 0] == 2
