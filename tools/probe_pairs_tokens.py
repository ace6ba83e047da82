#!/usr/bin/env python
"""HW verify + timing for the positions-driven scheme-0 deflate front end.

encode(pairs_out) -> tokens_from_pairs_device vs the byte-scan tokenizer
(tokenize_pallas + compact), byte-identity + per-stage delta-scan timing
at the production config (4096^2, 1%, 4-frame batch).
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from pyrecode_tpu.profiling import enable_compile_cache, delta_scan_time
from pyrecode_tpu.ops import pallas_tokens as ptk, pallas_deflate as pdk
from pyrecode_tpu.ops.pallas_encode import encode_l1_pallas
from pyrecode_tpu.codecs import dyndeflate as dd

enable_compile_cache()

B, H, W = 4, 4096, 4096
rng = np.random.default_rng(42)
frames = np.where(rng.random((B, H, W)) < 0.01,
                  rng.integers(1, 4096, (B, H, W)), 0).astype(np.uint16)
thr = np.zeros((H, W), np.uint16)
n = H * W // 8
NP = 1 << 18   # pairs bound (nnz bytes ~161K)
TOK = 1 << 19

fj = jnp.asarray(frames)
tj = jnp.asarray(thr)

# ---- correctness ----
bm, comp, cnts, ovf, pairs, pcnt = encode_l1_pallas(
    fj, tj, out_size=1 << 19, bucket=0, interpret=False, pairs_out=NP)
assert not np.asarray(ovf).any(), "encode overflow"
pairs_np, pcnt_np = np.asarray(pairs), np.asarray(pcnt)
for i in range(B):
    bmb = np.asarray(bm)[i]
    ref_idx = np.flatnonzero(bmb)
    nn = int(pcnt_np[i])
    assert nn == ref_idx.size, (nn, ref_idx.size)
    p = pairs_np[i, :nn]
    assert np.array_equal(p >> 8, ref_idx), i
    assert np.array_equal(p & 255, bmb[ref_idx].astype(p.dtype)), i
print("pairs output vs bitmap nonzeros: OK")

tok, hist, tcnt, flag, adler = ptk.tokens_from_pairs_device(
    pairs, pcnt, n, TOK, interpret=False)
assert not np.asarray(flag).any(), "unexpected fallback flag"
import zlib
for i in range(B):
    bmb = np.asarray(bm)[i].tobytes()
    lut_ref, sym_ref = dd.tokenize_bytes_np(np.frombuffer(bmb, np.uint8))
    keep = lut_ref != dd.NO_TOKEN
    inv_ref = (512 - lut_ref[keep]).astype(np.int32)
    ntok = int(np.asarray(tcnt)[i])
    assert ntok == inv_ref.size, (ntok, inv_ref.size)
    assert np.array_equal(np.asarray(tok)[i, :ntok], inv_ref), i
    hk = np.asarray(hist)[i].copy(); hk[287] = 0
    hist_ref = np.bincount(sym_ref[keep], minlength=512)
    assert np.array_equal(hk[:286], hist_ref[:286].astype(hk.dtype)), i
    assert int(np.asarray(adler)[i]) == zlib.adler32(bmb), i
print("tokens + hist + adler vs byte tokenizer: OK")

# ---- timing ----
SCAN = 8
u = jax.random.uniform(jax.random.key(0), (SCAN, B, H, W), jnp.float32)
v = jax.random.randint(jax.random.key(1), (SCAN, B, H, W), 1, 4096, jnp.int32)
fr_all = jnp.where(u < 0.01, v, 0).astype(jnp.uint16)
jax.block_until_ready(fr_all)

def enc_plain(fr, t):
    o = encode_l1_pallas(fr, t, out_size=1 << 19, bucket=0, interpret=False)
    return o[0], o[2]

def enc_pairs(fr, t):
    o = encode_l1_pallas(fr, t, out_size=1 << 19, bucket=0, interpret=False,
                         pairs_out=NP)
    return o[0], o[2], o[4], o[5]

dt0 = delta_scan_time(enc_plain, fr_all, tj)
dt1 = delta_scan_time(enc_pairs, fr_all, tj)
print(f"encode plain: {dt0*1e3:.2f} ms/batch; +pairs: {dt1*1e3:.2f} "
      f"(delta {1e3*(dt1-dt0):+.2f})")

pairs_scan = jnp.stack([pairs] * SCAN)
jax.block_until_ready(pairs_scan)
def tk(p):
    t_, h_, c_, f_, a_ = ptk.tokens_from_pairs_device(p, pcnt, n, TOK,
                                                      interpret=False)
    return c_, h_, f_, t_[:, ::997]
dt2 = delta_scan_time(tk, pairs_scan)
print(f"tokens_from_pairs: {dt2*1e3:.2f} ms/batch")

# reference: byte tokenize + compact timings
bms = jnp.asarray(np.stack([np.asarray(bm)] * SCAN))
lens = jnp.asarray(np.full(B, n, np.int32))
jax.block_until_ready(bms)
def tkc(bmx):
    d, h_, a_, c_, o_ = pdk.tokenize_compact_pallas(bmx, lens, 1, 1 << 19,
                                                    interpret=False)
    return c_, h_, d[:, ::997]
dt3 = delta_scan_time(tkc, bms)
print(f"byte fused tokenize+compact: {dt3*1e3:.2f} ms/batch")
