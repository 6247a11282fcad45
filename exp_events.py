"""Host-only analysis: dense pair count vs packed pair/event/slab counts.

Decides whether a packed Pallas E2 (permutation-matmul scatter) can beat the
dense fused kernel on flops.  Per unrolled level:
  dense_pairs : grid-tile GEMM triples (current dense E2 flop unit)
  pk_pairs    : packed (chunk x b-tile) pairs (ideal packed flop unit)
  pk_events   : (chunk, b-tile, dst-row-tile) events — one matmul each
                after per-(chunk,row-tile) slab precompute
  pk_slabs    : distinct (chunk, dst-row-tile) incidences — one extra
                matmul each (S @ O unpack)
Run: python exp_events.py [nx] [T]
"""
import sys
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")

from pastix_tpu.generators import poisson_3d
from pastix_tpu.pastix import Pastix
from pastix_tpu.config import PastixConfig
from pastix_tpu.analyze.packed import build_packed_plan, scalar_supports

nx = int(sys.argv[1]) if len(sys.argv) > 1 else 48
T = int(sys.argv[2]) if len(sys.argv) > 2 else 128
A = poisson_3d(nx)
s = Pastix(A, PastixConfig(tile_size=T))
s.order(); s.symbfact(); s.analyze()
lay = s.layout
pat = s._pat_perm_ext
plan = build_packed_plan(lay, pat)
supports = scalar_supports(pat, T, lay.nbc)

tot = dict(dense=0, pkp=0, pkev=0, pkslab=0)
print(f"n={A.n} T={T} nbc={lay.nbc} npool={lay.npool} levels={len(lay.levels)}")
for li, (lv, pk) in enumerate(zip(lay.levels, plan.levels)):
    dense = lv.gemm_a.size
    pkp = pk.pa.size
    # events: per pair, number of distinct dst tiles = distinct dst[g]//T
    # (excluding OOB); slabs: distinct (chunk, dst-row-tile)
    ev = 0; slabs = set()
    if pkp:
        dt = pk.dst // T  # (ng, T) dst tile per row
        for g in range(pkp):
            tiles = np.unique(dt[g][dt[g] < lay.npool])
            ev += tiles.size
            for t_ in tiles:
                slabs.add((pk.pa[g], t_ % 1 if False else t_))
    # slab = (a-chunk, dst ROW tile) — dst tile encodes (row,col); the row
    # tile of dst (r in chunk) is the same across b-tiles only per (I,K)…
    # approximate: count distinct (pa, dst-row-tile) via first b-tile? use
    # unique rows instead:
    tot["dense"] += dense; tot["pkp"] += pkp; tot["pkev"] += ev
    tot["pkslab"] += len(slabs)
    if dense > 2000:
        print(f"  lvl {li}: dense={dense} pk_pairs={pkp} events={ev} "
              f"ev/pair={ev/max(pkp,1):.2f}")
gf = lambda k: 2.0 * tot[k] * T**3 / 1e9
print(f"TOTAL dense_pairs={tot['dense']} ({gf('dense'):.1f} GF) "
      f"pk_pairs={tot['pkp']} ({gf('pkp'):.1f} GF) "
      f"pk_events={tot['pkev']} ({gf('pkev'):.1f} GF) "
      f"pk_slabs={tot['pkslab']} ({gf('pkslab'):.1f} GF)")
print(f"packed-pallas/dense flop ratio = "
      f"{(tot['pkev'] + tot['pkslab']) / max(tot['dense'],1):.3f}")
