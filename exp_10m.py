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
# the PRODUCT analyze path: with auto-OOC forced (as a 13 GiB chip
# would), the resident-pool program builders are skipped and analyze
# reduces to layout + dense-tail decision + OOC segmentation — the
# low-memory mode VERDICT r4 asked for.  (The r4 attempt bypassed
# Pastix.analyze entirely with a layout-only call.)
os.environ["PASTIX_FORCE_AUTO_OOC"] = "1"
s.analyze()
_stop.set()
lay = s.layout
pool_gb = lay.npool * lay.T * lay.T * 4 / 2**30
padded = lay.padded_flops()
print(f"analyze(product, auto-OOC): {time.time()-t0:.1f}s tiles={lay.npool} "
      f"levels={len(lay.levels)} pool={pool_gb:.1f} GiB "
      f"padded/useful={padded/s.report.fact_flops:.2f} "
      f"rss {rss_gb():.1f} GB", flush=True)

plan = s._ooc_plan
if plan is None:
    print("pool fits a 13 GiB chip resident", flush=True)
else:
    mf = plan.max_footprint_tiles()
    hbm = float(os.environ.get("PASTIX_HBM_GB", "13")) * 2**30
    feasible = mf * lay.T**2 * 4 <= hbm
    print(f"auto-OOC plan: {len(plan.segments)} segments, max window "
          f"{mf} tiles ({mf * lay.T**2 * 4 / 2**30:.1f} GiB) "
          f"feasible={feasible} rss {rss_gb():.1f} GB", flush=True)
    assert feasible, "a segment window exceeds the HBM budget"
    # prove the jitted program CONSTRUCTION fits host RAM: trace+lower
    # the largest segment's factorize program (no arrays, no execution)
    from pastix_tpu.numeric.ooc import build_segment_fact_fn

    big = max(plan.segments, key=lambda g: g.footprint_tiles())
    t0 = time.time()
    fn = build_segment_fact_fn(lay, big, chunk=plan.gemm_chunk)
    buf_shape = jax.ShapeDtypeStruct(
        (big.footprint_tiles(), lay.T, lay.T), np.float32
    )
    out = jax.eval_shape(fn, buf_shape)
    print(f"largest segment program traced: {time.time()-t0:.1f}s "
          f"out={out.shape} rss {rss_gb():.1f} GB", flush=True)
print("OK", flush=True)
