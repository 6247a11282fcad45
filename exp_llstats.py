"""Host-only: LL schedule shape stats at the flagship (chunk counts,
cache sizes, padding overhead) to validate compile-time feasibility.
Run: python exp_llstats.py [nx] [cap] [G]
"""
import sys, time
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")

from pastix_tpu.generators import poisson_3d
from pastix_tpu.pastix import Pastix
from pastix_tpu.config import PastixConfig
from pastix_tpu.analyze.layout import plan_dense_tail
from pastix_tpu.numeric.leftlook import build_ll_schedule, regroup_left
from pastix_tpu.numeric.grouping import group_plan

nx = int(sys.argv[1]) if len(sys.argv) > 1 else 100
cap = int(sys.argv[2]) if len(sys.argv) > 2 else 384
G = int(sys.argv[3]) if len(sys.argv) > 3 else 4

A = poisson_3d(nx)
s = Pastix(A, PastixConfig(tile_size=128))
s.order(); s.symbfact(); s.analyze()
lay = s.layout
dt = plan_dense_tail(lay)
levels = dt.levels_lo if dt is not None else lay.levels
print(f"n={A.n} levels={len(levels)} tail_s={dt.s if dt else None}")


class _Shim:
    def __init__(self, g, t, d):
        import types
        mk = lambda n: types.SimpleNamespace(size=n)
        self.gemm_a = mk(g); self.trsm_panel = mk(t); self.diag = mk(d)


# incoming counts per level for the plan shim
ncol = int(lay.blk_col.max()) + 1
col2li = np.full(ncol, -1, np.int64)
for li, lv in enumerate(levels):
    col2li[lv.cols] = li
inc_n = np.zeros(len(levels), np.int64)
for lv in levels:
    if lv.gemm_d.size == 0:
        continue
    tcol = lay.blk_col[lv.gemm_d]
    m = (tcol < dt.s) if dt is not None else np.ones(tcol.size, bool)
    tli = col2li[tcol[m]]
    np.add.at(inc_n, tli[tli >= 0], 1)

shims = [
    _Shim(int(lv.gemm_a.size + inc_n[i]), int(lv.trsm_panel.size),
          int(lv.diag.size))
    for i, lv in enumerate(levels)
]
plan = group_plan(shims, T=lay.T)
unrolled = {i for tag, i in plan if tag == "unroll"}
print(f"plan: {len(unrolled)} unrolled, "
      f"{len(levels)-len(unrolled)} scanned")

t0 = time.time()
reduced, incoming, tail = regroup_left(
    levels, lay.blk_col, dt.s if dt else None, unrolled)
print(f"regroup: {time.time()-t0:.1f}s")
resid = sum(lv.gemm_a.size for lv in reduced)
inc_tot = sum(i[0].size for i in incoming)
print(f"pairs: incoming {inc_tot}, residue {resid}, "
      f"tail {tail[0].size if tail else 0}")

t0 = time.time()
nch = {"bcache": 0, "full": 0}
pair_pad = 0
pairs_real = 0
cache_gb = 0.0
ns_list = []
ct_list = []
for li in sorted(unrolled):
    ga, gb, gd, gk, nd = incoming[li]
    if ga.size == 0:
        continue
    sch = build_ll_schedule(ga, gb, gd, group=G, cap=cap)
    for t in sch:
        nch[t["mode"]] += 1
        pair_pad += t["nsteps"] * G - t["n_real"]
        pairs_real += t["n_real"]
        cache_gb += t["CT"] * 128 * 128 * 2
        ns_list.append(t["nsteps"])
        ct_list.append(t["CT"])
print(f"level schedules ({time.time()-t0:.0f}s): "
      f"chunks bcache={nch['bcache']} full={nch['full']}, "
      f"pad overhead {pair_pad/max(1,pairs_real)*100:.1f}%, "
      f"cache DMA total {cache_gb/1e9:.1f} GB")
if ns_list:
    print(f"  nsteps: med {int(np.median(ns_list))} "
          f"max {max(ns_list)}; CT: med {int(np.median(ct_list))} "
          f"max {max(ct_list)}, distinct (ns,CT) "
          f"{len(set(zip(ns_list, ct_list)))}")

if tail is not None and tail[0].size:
    t0 = time.time()
    sch = build_ll_schedule(tail[0], tail[1], tail[2], group=G, cap=cap)
    nst = sum(t["nsteps"] for t in sch)
    pad = sum(t["nsteps"] * G - t["n_real"] for t in sch)
    modes = {}
    for t in sch:
        modes[t["mode"]] = modes.get(t["mode"], 0) + 1
    print(f"tail schedule ({time.time()-t0:.0f}s): chunks={len(sch)} "
          f"({modes}), steps {nst}, pad {pad/tail[0].size*100:.1f}%, "
          f"cache total {sum(t['CT'] for t in sch)*128*128*2/1e9:.1f} GB, "
          f"med pairs/chunk {int(np.median([t['n_real'] for t in sch]))}")
