"""Positions-driven deflate tokenizer (ops/pallas_tokens.py) vs oracle.

Status note (round 5, hw-measured): this chain is byte-identical to the
byte-scan tokenizer on hardware but SLOWER at the production config
(tools/probe_pairs_tokens.py: encode+pairs +1.36 ms and tokens 3.50 ms
vs 1.52 ms for the fused byte tokenize+compact per 4-frame 4096^2
batch) — the per-byte scan's closed-form rules are cheaper than
per-element slot machinery despite touching 12x more data.  The kernels
stay as a correct, tested alternative; production keeps the byte path.
"""

import numpy as np
import pytest

from pyrecode_tpu.codecs import dyndeflate as dd
from pyrecode_tpu.ops import pallas_tokens as ptk


def _pairs_for(x, n):
    idx = np.flatnonzero(x)
    NP = -(-max(idx.size + 1, 1) // ptk.CH_P) * ptk.CH_P
    pairs = np.full((1, NP), np.int32(n) << 8, np.int32)
    pairs[0, : idx.size] = (idx.astype(np.int32) << 8) | x[idx]
    return pairs, idx


def test_tokens_from_pairs_np_matches_byte_tokenizer():
    """The closed-form per-gap schedule reproduces the per-byte rules."""
    rng = np.random.default_rng(0)
    checked = 0
    for trial in range(40):
        n = int(rng.integers(1, 30000))
        dens = rng.choice([0.003, 0.02, 0.1, 0.3])
        x = (rng.integers(1, 256, n) * (rng.random(n) < dens)
             ).astype(np.uint8)
        lut_ref, sym_ref = dd.tokenize_bytes_np(x)
        keep = lut_ref != dd.NO_TOKEN
        idx = np.flatnonzero(x)
        out = dd.tokens_from_pairs_np(idx, x[idx].astype(np.int64), n)
        if out is None:
            continue  # nonzero run >= 4: declared out of scope
        checked += 1
        assert np.array_equal(out[0], lut_ref[keep])
        assert np.array_equal(out[1], sym_ref[keep])
    assert checked >= 20


def test_tokens_kernel_matches_oracle_interpret():
    import zlib

    rng = np.random.default_rng(1)
    n = 20000
    for dens in (0.01, 0.06):
        x = (rng.integers(1, 256, n) * (rng.random(n) < dens)
             ).astype(np.uint8)
        pairs, idx = _pairs_for(x, n)
        tok, hist, cnt, flag, adler = ptk.tokens_from_pairs_device(
            pairs, np.array([idx.size]), n, tok_bound=1 << 14,
            interpret=True)
        gaps = np.diff(np.concatenate(([-1], idx, [n]))) - 1
        ref = dd.tokens_from_pairs_np(idx, x[idx].astype(np.int64), n)
        if ref is None or gaps.max() > ptk.GAP_MAX:
            assert bool(np.asarray(flag)[0])
            continue
        assert not bool(np.asarray(flag)[0])
        lut_ref, sym_ref = ref
        inv_ref = (512 - lut_ref).astype(np.int32)
        ntok = int(np.asarray(cnt)[0])
        assert ntok == inv_ref.size
        assert np.array_equal(np.asarray(tok)[0, :ntok], inv_ref)
        hk = np.asarray(hist)[0].copy()
        hk[287] = 0  # dead-slot bin
        href = np.bincount(sym_ref, minlength=512)
        assert np.array_equal(hk[:286], href[:286].astype(hk.dtype))
        assert int(np.asarray(adler)[0]) == zlib.adler32(x.tobytes())


def test_tokens_kernel_flags_unsupported():
    # giant gap -> fallback flag; nonzero run of 4 -> fallback flag
    n = 30000
    x = np.zeros(n, np.uint8)
    x[0] = 5
    x[n - 1] = 7
    pairs, idx = _pairs_for(x, n)
    _, _, _, flag, _ = ptk.tokens_from_pairs_device(
        pairs, np.array([idx.size]), n, tok_bound=1 << 12, interpret=True)
    assert bool(np.asarray(flag)[0])

    y = np.zeros(4096, np.uint8)
    y[100:104] = 9
    y[::8] = 1  # keep gaps small
    pairs, idx = _pairs_for(y, y.size)
    _, _, _, flag, _ = ptk.tokens_from_pairs_device(
        pairs, np.array([idx.size]), y.size, tok_bound=1 << 12,
        interpret=True)
    assert bool(np.asarray(flag)[0])


def test_encode_pairs_out_interpret():
    """Fused nonzero-byte pairs from the L1 encode kernel."""
    from pyrecode_tpu import oracle
    from pyrecode_tpu.ops.pallas_encode import encode_l1_pallas

    rng = np.random.default_rng(3)
    H, W, B = 64, 512, 2
    frames = (rng.integers(1, 4096, (B, H, W))
              * (rng.random((B, H, W)) < 0.01)).astype(np.uint16)
    thr = np.zeros((H, W), np.uint16)
    bm, comp, counts, ovf, pairs, pcnt = encode_l1_pallas(
        frames, thr, out_size=2048, bucket=0, interpret=True,
        pairs_out=2048)
    assert not np.asarray(ovf).any()
    for i in range(B):
        red = oracle.reduce_frame(frames[i], thr, 1, 12)
        bmb = np.frombuffer(red["packed_binary_map"], np.uint8)
        ri = np.flatnonzero(bmb)
        nn = int(np.asarray(pcnt)[i])
        p = np.asarray(pairs)[i, :nn]
        assert nn == ri.size
        assert np.array_equal(p >> 8, ri)
        assert np.array_equal(p & 255, bmb[ri].astype(p.dtype))
        assert np.asarray(bm)[i].tobytes() == red["packed_binary_map"]
    # plain-call identity
    b2, c2, n2, o2 = encode_l1_pallas(frames, thr, out_size=2048, bucket=0,
                                      interpret=True)
    assert np.array_equal(np.asarray(c2), np.asarray(comp))
    assert np.array_equal(np.asarray(b2), np.asarray(bm))
