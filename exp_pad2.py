"""Actual tile-layout padded/useful as a function of T (and amalg target).

The (wg,hg) model in exp_pad.py ignores row-tile coalescing (shared tiles
between fragments), which the real layout exploits heavily.  This measures
the real thing: build the full analysis at several tile sizes and compare
padded flops, pool size, and level count.

Run: python exp_pad2.py [nx] [kind]
"""
import sys
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")

from pastix_tpu.generators import poisson_3d, elasticity_3d
from pastix_tpu.pastix import Pastix
from pastix_tpu.config import PastixConfig

nx = int(sys.argv[1]) if len(sys.argv) > 1 else 64
kind = sys.argv[2] if len(sys.argv) > 2 else "poisson"
A = elasticity_3d(nx) if kind == "elas" else poisson_3d(nx)
dof = 3 if kind == "elas" else 1

print(f"{'T':>4} {'amalg':>6} {'nbc':>7} {'npool':>8} {'levels':>6} "
      f"{'useful':>10} {'padded':>10} {'ratio':>6} {'poolGiB':>8} "
      f"{'sec':>6}")
import time
for T, frac in [(128, 0.5), (128, 0.75), (96, 0.5), (64, 0.5), (64, 0.75),
                (48, 0.5), (32, 0.5)]:
    t0 = time.time()
    cfg = PastixConfig(tile_size=T, amalg_target_frac=frac, dof_nbr=dof)
    s = Pastix(A, cfg)
    s.order(); s.symbfact(); s.analyze()
    lay = s.layout
    useful = s.report.fact_flops
    print(f"{T:>4} {frac:>6} {lay.nbc:>7} {lay.npool:>8} "
          f"{len(lay.levels):>6} {useful:>10.3e} {lay.padded_flops():>10.3e} "
          f"{lay.padded_flops()/useful:>6.2f} "
          f"{lay.npool*T*T*4/2**30:>8.2f} {time.time()-t0:>6.1f}")
