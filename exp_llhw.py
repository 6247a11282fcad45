"""Hardware A/B: left-looking E2 (PASTIX_E2_LL) vs the r4 stream default.

Run on TPU: python exp_llhw.py [nx] [kind] [reps]
Set PASTIX_E2_LL=0/1 outside (build-time env); prints steady-state fact
time + refined residual.
"""
import os, sys, time
import numpy as np

cache = "/root/.cache/pastix_jax"
import jax
try:
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass
import jax.numpy as jnp

nx = int(sys.argv[1]) if len(sys.argv) > 1 else 64
kind = sys.argv[2] if len(sys.argv) > 2 else "llt"
reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3

from pastix_tpu.generators import poisson_3d, elasticity_3d, convection_diffusion_3d as convdiff_3d
from pastix_tpu.pastix import Pastix
from pastix_tpu.config import PastixConfig, Factorization

t0 = time.time()
if kind == "elas":
    A = elasticity_3d(nx)
    cfg = PastixConfig(tile_size=128, dof_nbr=3)
elif kind == "lu":
    A = convdiff_3d(nx)
    cfg = PastixConfig(tile_size=128, factorization=Factorization.LU)
else:
    A = poisson_3d(nx)
    cfg = PastixConfig(tile_size=128)
s = Pastix(A, cfg)
s.order(); s.symbfact(); s.analyze()
print(f"n={A.n} analyze {time.time()-t0:.1f}s "
      f"LL={os.environ.get('PASTIX_E2_LL', '1')} "
      f"padded/useful={s.layout.padded_flops()/s.report.fact_flops:.2f}",
      flush=True)

t0 = time.time()
s.factorize()
print(f"first factorize (compile+run): {time.time()-t0:.1f}s", flush=True)
ts = []
for _ in range(reps):
    t0 = time.time()
    s.factorize()
    ts.append(time.time() - t0)
ms = min(ts) * 1e3
gf = s.report.fact_flops / min(ts) / 1e9
print(f"steady fact: {ms:.1f} ms -> {gf:.1f} useful GFLOP/s", flush=True)

b = np.ones(A.n, np.float64)
t0 = time.time()
x = s.solve(b)
r = np.linalg.norm(b - (A.to_scipy() @ x)) / np.linalg.norm(b)
print(f"solve+refine {time.time()-t0:.1f}s residual {r:.2e}", flush=True)
