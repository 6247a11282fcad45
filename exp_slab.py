"""Host-only analysis: panel-slab E2 job statistics.

The pipelined pair kernel is DMA-descriptor-bound (~2 descriptors per
4.2 MFLOP pair, exp_pipe/exp_compact round 3).  Panels are CONTIGUOUS in
the pool (keys sorted by (col,row)), so pairs of one source column can be
served by slab DMAs: job = (source column K, a-row-chunk ci, b-row-chunk
cj) fetches two C-tile operand slabs plus one H-tile dst window
[min gd, max gd] — valid when the dst span fits H (pool ordering makes
the window contiguous when row sets are dense-ish, i.e. near the top of
the tree where the flops are).

This measures, for the real plan: the fraction of pairs coverable by
dense jobs vs the per-pair fallback, descriptors per pair, and the
identical-window merge rate (consecutive jobs sharing (ci,cj) rows across
source columns K can keep the dst window in VMEM).

Run: python exp_slab.py [nx] [C] [H]
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
H = int(sys.argv[3]) if len(sys.argv) > 3 else 48
A = poisson_3d(nx)
s = Pastix(A, PastixConfig(tile_size=128))
s.order(); s.symbfact(); s.analyze()
lay = s.layout
diag_of_col = lay.lookup(np.arange(lay.nbc), np.arange(lay.nbc))

tot = dict(pairs=0, dense_pairs=0, jobs=0, merged=0, desc_slab=0,
           desc_pair=0)
for li, lv in enumerate(lay.levels):
    ng = lv.gemm_a.size
    if ng == 0:
        continue
    start = diag_of_col[lv.gemm_k] + 1  # panel base pool index
    ia = lv.gemm_a - start
    ib = lv.gemm_b - start
    job_key = (
        lv.gemm_k.astype(np.int64) * (1 << 40)
        + (ia // C).astype(np.int64) * (1 << 20)
        + (ib // C)
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
    dense_pairs = cnt[dense].sum()
    # identical-dst-window merges: consecutive dense jobs (sorted by
    # (dmin, K)) with the same [dmin, dmax] window
    dj = np.flatnonzero(dense)
    if dj.size:
        o2 = np.lexsort((uniq[dj], dmin[dj]))
        dj = dj[o2]
        same = (np.diff(dmin[dj]) == 0) & (np.diff(dmax[dj]) == 0)
        merged = int(same.sum())
    else:
        merged = 0
    # descriptors: dense jobs: 2 slab (a,b) + 2 dst (rd+wr), minus 2 per
    # merged; fallback pairs: 2 each + segment dst (ignore)
    desc_slab = 4 * int(dense.sum()) - 2 * merged
    desc_pair = 2 * int(ng - dense_pairs)
    tot["pairs"] += ng
    tot["dense_pairs"] += int(dense_pairs)
    tot["jobs"] += int(dense.sum())
    tot["merged"] += merged
    tot["desc_slab"] += desc_slab
    tot["desc_pair"] += desc_pair
    if ng > 20000:
        print(f"  lvl {li}: pairs={ng} jobs={njobs} dense%={100*dense_pairs/ng:.0f} "
              f"med_span={int(np.median(span))} med_cnt={int(np.median(cnt))} "
              f"merged={merged}")

dp = tot["dense_pairs"]
print(f"\nTOTAL pairs={tot['pairs']} dense={dp} ({100*dp/tot['pairs']:.1f}%) "
      f"jobs={tot['jobs']} merged={tot['merged']}")
print(f"descriptors/pair: now ~2.0 -> slab scheme "
      f"{(tot['desc_slab']+tot['desc_pair'])/tot['pairs']:.3f} "
      f"(dense jobs avg {dp/max(tot['jobs'],1):.1f} pairs/job)")
