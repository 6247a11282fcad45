"""Split the ~390 ms/Richardson-step of the flagship device refine.

exp_step.py refuted the dispatch-overhead theory (unroll=3 costs 3.4x a
single step -> the cost is per-step device work).  Candidates inside one
step (krylov.build_device_refine_step_fn):
  sweep  : apply_M = whole-sweep fwd+bwd Pallas solve (70 ms claimed)
  resid  : two-float ELL residual (2x per step at unroll=1)
  misc   : two_sum renormalize + reshapes

Times each part as its own jitted program at nx (default 100).
Run: python exp_step2.py [nx]
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

nx = int(sys.argv[1]) if len(sys.argv) > 1 else 100

from pastix_tpu.generators import poisson_3d
from pastix_tpu.pastix import Pastix
from pastix_tpu.config import PastixConfig, Factorization

t0 = time.time()
A = poisson_3d(nx)
s = Pastix(A, PastixConfig(tile_size=128))
s.analyze()
print(f"n={A.n} analyze {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
s.factorize()
print(f"factorize: {time.time()-t0:.1f}s", flush=True)

lay, f = s.layout, s.factors
from pastix_tpu.krylov import df_split, build_ell, _two_prod, _two_sum
import scipy.sparse as sp

nflat = lay.nbc * lay.T
b = A.to_scipy() @ np.ones(A.n)
b_ext = s._perm_rhs(b)
bpad = np.zeros(nflat, np.float64)
bpad[: b_ext.shape[0]] = b_ext
bh_np, bl_np = df_split(bpad)
bh, bl = jnp.asarray(bh_np), jnp.asarray(bl_np)

Ac = sp.coo_matrix(s._A_perm)
cols_np, vals_np = build_ell(Ac, nflat, np.float64)
vh_np, vl_np = df_split(vals_np)
cols, vh, vl = jnp.asarray(cols_np), jnp.asarray(vh_np), jnp.asarray(vl_np)
print(f"ell k={cols_np.shape[1]}", flush=True)

# the product sweep-solve program (fwd+bwd), same factors
solve_fn = s._solve_fn_inv
dinv = f.dinv

xh = jnp.asarray(bh_np.astype(np.float32))
xl = jnp.zeros_like(xh)


def residual_df(xh, xl):
    k = cols.shape[1]
    Xh = xh[cols]
    Xl = xl[cols]
    p, e = _two_prod(vh, Xh)
    e = e + vh * Xl + vl * Xh
    sh = p[:, 0]
    se = e[:, 0]
    for i in range(1, k):
        sh, e2 = _two_sum(sh, p[:, i])
        se = se + e2 + e[:, i]
    rh, re = _two_sum(bh, -sh)
    return rh + (re + (bl - se))


def resid_fp32(xh):
    # plain fp32 ELL SpMV for comparison (no compensation)
    vh32 = vh
    y = jnp.sum(vh32 * xh[cols], axis=1)
    return bh - y


def sync(x):
    jax.block_until_ready(x)
    return float(np.asarray(x.ravel()[-1]))


def timeit(name, fn, *args, reps=3):
    t0 = time.time()
    out = fn(*args)
    sync(out if not isinstance(out, tuple) else out[0])
    tc = time.time() - t0
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        sync(out if not isinstance(out, tuple) else out[0])
        ts.append(time.time() - t0)
    print(f"{name:12s}: {min(ts)*1e3:7.1f} ms (first {tc:.1f}s)", flush=True)


bb = jnp.asarray(bh_np.astype(np.float32).reshape(lay.nbc, lay.T, 1))
timeit("sweep_solve", lambda y: solve_fn(f.pool, dinv, y), bb)
timeit("resid_df", jax.jit(residual_df), xh, xl)
timeit("resid_fp32", jax.jit(resid_fp32), xh)
timeit("gather_only", jax.jit(lambda x: x[cols].sum(axis=1)), xh)
