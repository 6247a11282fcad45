"""Slab E2 v2 statistics: job = (source col K, b row-tile j, a-chunk ci).

dst tiles {lookup(rows[ci], rows[j])} lie inside destination column
J=rows[j]'s contiguous panel; span exceeds the pair count only by
interleaved fill rows (rows of J's panel not rows of K's).  Descriptors:
panel chunks amortize a AND b fetches (2/C^2-ish), dst window rd+wr is
2 per job (C pairs).

Run: python exp_slab2.py [nx] [C] [SLACK]
"""
import sys
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")

from pastix_tpu.generators import poisson_3d
from pastix_tpu.pastix import Pastix
from pastix_tpu.config import PastixConfig

nx = int(sys.argv[1]) if len(sys.argv) > 1 else 64
C = int(sys.argv[2]) if len(sys.argv) > 2 else 8
SLACK = int(sys.argv[3]) if len(sys.argv) > 3 else 2  # H = SLACK * C
H = SLACK * C
A = poisson_3d(nx)
s = Pastix(A, PastixConfig(tile_size=128))
s.order(); s.symbfact(); s.analyze()
lay = s.layout
diag_of_col = lay.lookup(np.arange(lay.nbc), np.arange(lay.nbc))

tot = dict(pairs=0, dense_pairs=0, jobs=0, desc=0.0)
for li, lv in enumerate(lay.levels):
    ng = lv.gemm_a.size
    if ng == 0:
        continue
    start = diag_of_col[lv.gemm_k] + 1
    ia = lv.gemm_a - start
    job_key = (
        lv.gemm_b.astype(np.int64) * (1 << 24) + (ia // C)
    )
    order = np.argsort(job_key, kind="stable")
    jk = job_key[order]
    gd = lv.gemm_d[order]
    uniq, inv = np.unique(jk, return_inverse=True)
    njobs = uniq.size
    dmin = np.full(njobs, np.iinfo(np.int64).max)
    dmax = np.full(njobs, -1)
    np.minimum.at(dmin, inv, gd)
    np.maximum.at(dmax, inv, gd)
    span = dmax - dmin + 1
    cnt = np.bincount(inv, minlength=njobs)
    dense = span <= H
    dense_pairs = int(cnt[dense].sum())
    # descriptors: per (K,ci) a-chunk fetch (amortized; count distinct
    # (K, ci) among dense jobs) + 2 per dense job + 2 per fallback pair
    kci = (lv.gemm_k.astype(np.int64)[order] * (1 << 24) + (ia[order] // C))
    nslab = np.unique(kci[dense[inv]]).size
    desc = nslab + 2 * int(dense.sum()) + 2 * (ng - dense_pairs)
    tot["pairs"] += ng
    tot["dense_pairs"] += dense_pairs
    tot["jobs"] += int(dense.sum())
    tot["desc"] += desc
    if ng > 20000:
        print(f"  lvl {li}: pairs={ng} jobs={njobs} dense%={100*dense_pairs/ng:.0f} "
              f"med_span={int(np.median(span))} med_cnt={int(np.median(cnt))}")

dp = tot["dense_pairs"]
print(f"\nC={C} H={H}: pairs={tot['pairs']} dense={dp} "
      f"({100*dp/tot['pairs']:.1f}%) jobs={tot['jobs']}")
print(f"descriptors/pair: now ~2.0 -> {tot['desc']/tot['pairs']:.3f}")
