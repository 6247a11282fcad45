"""Host pipeline at the 10M-dof rung (BASELINE config 5 scale, host side).

Runs order -> symbfact -> analyze ONLY (no device) on Poisson ~215^3
(~9.94M dof) or generated elasticity, printing phase times, table sizes,
the pool size, and the OOC segmentation the auto-OOC rescue would use on
a 13 GiB chip.  VERDICT r4 item 5: the int32/HBM walls at 1M were only
found by running — this finds the 10M ones.

Run: python exp_10m.py [nx] [kind]     (kind: poisson | elas)
"""
import os
import resource
import sys
import time

import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")

nx = int(sys.argv[1]) if len(sys.argv) > 1 else 215
kind = sys.argv[2] if len(sys.argv) > 2 else "poisson"

from pastix_tpu.generators import poisson_3d, elasticity_3d
from pastix_tpu.pastix import Pastix
from pastix_tpu.config import PastixConfig


def rss_gb():
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 2**20


t0 = time.time()
if kind == "elas":
    A = elasticity_3d(nx)
    cfg = PastixConfig(tile_size=128, dof_nbr=3)
else:
    A = poisson_3d(nx)
    cfg = PastixConfig(tile_size=128)
print(f"matrix: n={A.n} nnz={A.nnz} build {time.time()-t0:.1f}s "
      f"rss {rss_gb():.1f} GB", flush=True)

s = Pastix(A, cfg)
t0 = time.time()
s.order()
print(f"order: {time.time()-t0:.1f}s rss {rss_gb():.1f} GB", flush=True)
t0 = time.time()
s.symbfact()
print(f"symbfact: {time.time()-t0:.1f}s nnz(L)={s.report.nnz_l_exact:.3e} "
      f"flops={s.report.fact_flops:.3e} rss {rss_gb():.1f} GB", flush=True)
# RSS sampler: find where the memory goes at 10M (first run OOMed at
# 130 GB inside analyze)
import threading


def _sample():
    t00 = time.time()
    while not _stop.is_set():
        with open("/proc/self/status") as f:
            for ln in f:
                if ln.startswith("VmRSS"):
                    print(f"  [rss {time.time()-t00:6.0f}s] {ln.split()[1]} kB",
                          flush=True)
        _stop.wait(10.0)


_stop = threading.Event()
threading.Thread(target=_sample, daemon=True).start()
t0 = time.time()
# analysis-only: build the static plan directly.  Pastix.analyze() also
# builds the jitted factorize/solve programs, whose host-side schedule
# copies multiply the 2.3e8-pair tables; at 10M the plan itself is the
# deliverable (a 52 GiB pool needs multi-chip or OOC to factor anyway).
from pastix_tpu.analyze.layout import build_layout

lay = build_layout(s._pat_perm_ext, s._tile_size,
                   densify_tail_frac=cfg.dense_tail_fill)
s.layout = lay
_stop.set()
pool_gb = lay.npool * lay.T * lay.T * 4 / 2**30
padded = lay.padded_flops()
print(f"analyze(layout-only): {time.time()-t0:.1f}s tiles={lay.npool} "
      f"levels={len(lay.levels)} pool={pool_gb:.1f} GiB "
      f"padded/useful={padded/s.report.fact_flops:.2f} "
      f"rss {rss_gb():.1f} GB", flush=True)

# what would the auto-OOC do on a 13 GiB chip?
from pastix_tpu.numeric.ooc import plan_ooc

hbm = float(os.environ.get("PASTIX_HBM_GB", "13")) * 2**30
if pool_gb * 2**30 > hbm:
    t0 = time.time()
    plan = plan_ooc(lay, int(hbm), dtype_bytes=4)
    mf = plan.max_footprint_tiles()
    print(f"auto-OOC plan: {len(plan.segments)} segments, max window "
          f"{mf} tiles ({mf * lay.T**2 * 4 / 2**30:.1f} GiB) "
          f"[{time.time()-t0:.1f}s] rss {rss_gb():.1f} GB", flush=True)
else:
    print("pool fits a 13 GiB chip resident", flush=True)
print("OK", flush=True)
