"""Hardware validation of the whole-sweep solve + device refine path.

python exp_sweephw.py [nx] [kind]
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

from pastix_tpu.generators import (
    poisson_3d, elasticity_3d, convection_diffusion_3d as convdiff_3d)
from pastix_tpu.pastix import Pastix
from pastix_tpu.config import PastixConfig, Factorization
import pastix_tpu.solve as sm

t0 = time.time()
if kind == "elas":
    A = elasticity_3d(nx); cfg = PastixConfig(tile_size=128, dof_nbr=3)
elif kind == "lu":
    A = convdiff_3d(nx)
    cfg = PastixConfig(tile_size=128, factorization=Factorization.LU)
else:
    A = poisson_3d(nx); cfg = PastixConfig(tile_size=128)
s = Pastix(A, cfg)
s.order(); s.symbfact(); s.analyze()
print(f"n={A.n} analyze {time.time()-t0:.1f}s sweep={s._sweep_solve} "
      f"devref={'y' if s._devref_fn is not None else 'n'}", flush=True)

t0 = time.time()
s.factorize()
print(f"factorize+dinv (compile+run): {time.time()-t0:.1f}s", flush=True)


def sync(x):
    # slice ON DEVICE first: np.asarray(full) pulls the whole array
    # through the tunnel (139 MB = 4.7 s measured!) and poisons timings
    return float(np.asarray(x[(-1,) * x.ndim]).real)


# dinv steady-state timing (doubling inverse)
if s._dinv_fn is not None:
    ts = []
    for _ in range(3):
        t0 = time.time()
        if s.factors.pool_u is not None:
            o = s._dinv_fn(s.factors.pool, s.factors.pool_u)[0]
        else:
            o = s._dinv_fn(s.factors.pool)
        sync(o)
        ts.append(time.time() - t0)
    print(f"dinv (doubling): {min(ts)*1e3:.1f} ms", flush=True)

# raw sweep solve steady-state
f = s.factors
b = np.ones(A.n)
bb = jnp.asarray(sm.rhs_to_blocks(s.layout, s._perm_rhs(b), dtype=np.float32))
if s._solve_fn_inv is not None:
    def run():
        if f.kind == Factorization.LU:
            return s._solve_fn_inv(f.pool, f.pool_u, f.dinv, f.dinv_u, bb)
        if f.kind == Factorization.LDLT:
            return s._solve_fn_inv(f.pool, f.dinv, f.d, bb)
        return s._solve_fn_inv(f.pool, f.dinv, bb)
    t0 = time.time(); sync(run()); print(f"sweep solve first (compile+run): {time.time()-t0:.1f}s", flush=True)
    ts = []
    for _ in range(3):
        t0 = time.time(); sync(run()); ts.append(time.time() - t0)
    print(f"sweep solve steady: {min(ts)*1e3:.1f} ms", flush=True)

# full product solve + refine (first = compiles, then steady)
t0 = time.time()
x = s.solve(b)
r = np.linalg.norm(b - (A.to_scipy() @ x)) / np.linalg.norm(b)
print(f"solve+refine first {time.time()-t0:.1f}s residual {r:.2e} "
      f"iters {s.report.refine_iters} fallbacks {s.report.fallbacks}",
      flush=True)
t0 = time.time()
x = s.solve(b)
t_steady = time.time() - t0
r = np.linalg.norm(b - (A.to_scipy() @ x)) / np.linalg.norm(b)
print(f"solve+refine steady {t_steady*1e3:.1f} ms residual {r:.2e} "
      f"iters {s.report.refine_iters} (solve {s.report.solve_time*1e3:.0f} "
      f"refine {s.report.refine_time*1e3:.0f})", flush=True)
