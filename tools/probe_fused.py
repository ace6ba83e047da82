"""Probe: fused tokenize+compact divergence on real TPU (C1=1024 case).

tools/bench_deflate.py found the fused pass A+A.5 kernel
(pallas_deflate.tokenize_compact_pallas) diverging from the two-pass
pipeline on real v5e at bucket C1=1024 / ~22% token density, while
verify_hw's C1=2048 config passes.  This probe reproduces the exact bench
fixture (4096^2 bitmap at 1% occupancy), compares the fused output at every
capacity bucket against a numpy oracle built from the hardware token
stream, and dumps the mismatch pattern (position, chunk, tile row, whether
neighbouring tokens were summed — the dec5970 signature).

Run on the real TPU: `python tools/probe_fused.py [--size 4096]`.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from pyrecode_tpu.profiling import enable_compile_cache

enable_compile_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=4096)
    ap.add_argument("--occupancy", type=float, default=0.01)
    ap.add_argument("--buckets", type=str, default="2,3",
                    help="comma-separated TOKEN_BUCKETS indices to probe")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pyrecode_tpu.ops import pallas_deflate as pdk

    print("platform:", jax.devices()[0].platform, flush=True)

    rng = np.random.default_rng(0)
    n = args.size * args.size // 8
    npad = -(-n // pdk.CH_A) * pdk.CH_A
    mask = rng.random(args.size * args.size) < args.occupancy
    stream = np.zeros((1, npad), np.uint8)
    stream[0, :n] = np.packbits(mask, bitorder="little")
    lengths = np.full((1,), n, np.int32)

    # ---- dense tokenize on hw: the ground-truth token stream ----
    tok, hist, adler = pdk.tokenize_pallas(jnp.asarray(stream),
                                           jnp.asarray(lengths),
                                           interpret=False)
    tok_np = np.asarray(tok)[0].astype(np.int32)        # (npad,) inverted
    oracle = tok_np[tok_np != 0]                         # stream order
    tok_max = oracle.size
    density = tok_max / n
    tok_bound = max(pdk.CH_B, 1 << int(np.ceil(np.log2(max(tok_max, 1)))))
    print(f"tokens: {tok_max} ({100*density:.1f}%), tok_bound={tok_bound}",
          flush=True)

    # per-tile-row token counts: does any (8,2048) tile row exceed C1?
    rows = tok_np.reshape(-1, pdk.SUB_A)
    row_cnt = (rows != 0).sum(axis=1)
    print(f"tile-row token counts: max={row_cnt.max()} "
          f"p99={np.percentile(row_cnt, 99):.0f} mean={row_cnt.mean():.0f}",
          flush=True)

    oracle_pad = np.zeros(tok_bound, np.int32)
    oracle_pad[:tok_max] = oracle

    for b in (int(x) for x in args.buckets.split(",")):
        c1 = pdk.TOKEN_BUCKETS[b]
        dense, hist_f, adler_f, cnt, ovf = pdk.tokenize_compact_pallas(
            jnp.asarray(stream), jnp.asarray(lengths), b, tok_bound,
            interpret=False)
        dense_np = np.asarray(dense)[0].astype(np.int32)
        cnt_np = int(np.asarray(cnt)[0])
        ovf_np = bool(np.asarray(ovf)[0])
        ok = np.array_equal(dense_np, oracle_pad) and cnt_np == tok_max
        print(f"bucket {b} (C1={c1}): cnt={cnt_np} ovf={ovf_np} "
              f"match={'OK' if ok else 'FAIL'}", flush=True)
        if ok:
            continue
        bad = np.flatnonzero(dense_np != oracle_pad)
        print(f"  mismatched slots: {bad.size} "
              f"first={bad[:8].tolist()} last={bad[-4:].tolist()}")
        # diagnose the first few mismatches
        for i in bad[:6]:
            got, exp = dense_np[i], oracle_pad[i]
            note = ""
            if i + 1 < tok_max and got == exp + oracle_pad[i + 1]:
                note = " = exp[i]+exp[i+1] (PAIR SUM)"
            elif got == 0:
                note = " (DROPPED)"
            elif i >= tok_max:
                note = " (GHOST past end)"
            # which 16K chunk / tile row does token i come from?
            pos = np.flatnonzero(tok_np != 0)
            src = pos[i] if i < tok_max else -1
            print(f"  slot {i}: got={got} exp={exp}{note} "
                  f"src_byte={src} chunk={src // pdk.CH_A} "
                  f"tile_row={(src % pdk.CH_A) // pdk.SUB_A} "
                  f"lane={src % pdk.SUB_A} row_cnt={row_cnt[src // pdk.SUB_A] if src >= 0 else -1}")
        # is the damage confined to particular chunks?
        if bad.size:
            pos = np.flatnonzero(tok_np != 0)
            srcs = pos[bad[bad < tok_max]]
            chunks = np.unique(srcs // pdk.CH_A)
            print(f"  damaged chunks: {chunks.size} of {npad // pdk.CH_A} "
                  f"-> {chunks[:12].tolist()}")
            rcs = np.unique(row_cnt[np.unique(srcs // pdk.SUB_A)])
            print(f"  row counts at damage: {rcs[:12].tolist()}")


if __name__ == "__main__":
    main()
