"""Per-dispatch cost of the device-step refinement at the flagship.

BENCH r5 follow-up read solve_total_steady 4.3 s for init + 9 steps,
~480 ms/step against ~100 ms of device work (sweep 70 ms + two ELL
residuals) — the rest is tunnel dispatch+sync overhead.  This times the
init and the step program at unroll in {1, 3} to size the fix
(krylov.build_device_refine_step_fn(unroll=...)): k chained Richardson
steps per dispatch, ONE scalar down.

Run: python exp_step.py [nx=100] (uses the persistent compile cache;
run after bench.py so the factorization program is warm).
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
print(f"factorize (compile+run): {time.time()-t0:.1f}s", flush=True)

lay = s.layout
f = s.factors
from pastix_tpu.krylov import build_device_refine_step_fn, df_split, build_ell
import scipy.sparse as sp

nflat = lay.nbc * lay.T
b = A.to_scipy() @ np.ones(A.n)
b_ext = s._perm_rhs(b)
bpad = np.zeros(nflat, np.float64)
bpad[: b_ext.shape[0]] = b_ext
bh_np, bl_np = df_split(bpad)
bh, bl = jnp.asarray(bh_np), jnp.asarray(bl_np)
bb = jnp.asarray(bh_np.reshape(lay.nbc, lay.T, 1))

Ac = sp.coo_matrix(s._A_perm)
cols_np, vals_np = build_ell(Ac, nflat, np.float64)
vh_np, vl_np = df_split(vals_np)
cols, vh, vl = jnp.asarray(cols_np), jnp.asarray(vh_np), jnp.asarray(vl_np)
fa = (f.pool, f.dinv)


def sync_scalar(x):
    return float(np.asarray(x))


for u in (1, 3):
    init, step = build_device_refine_step_fn(
        lay, Factorization.LLT, use_sweep=True, unroll=u
    )
    t0 = time.time()
    xh, xl = init(fa, bb)
    jax.block_until_ready(xh)
    _ = float(np.asarray(xh[-1]))
    t_init = time.time() - t0
    t0 = time.time()
    xh, xl, r2 = step(fa, cols, vh, vl, bh, bl, xh, xl)
    r2f = sync_scalar(r2)
    t_first = time.time() - t0
    ts = []
    for _ in range(3):
        t0 = time.time()
        xh, xl, r2 = step(fa, cols, vh, vl, bh, bl, xh, xl)
        r2f = sync_scalar(r2)
        ts.append(time.time() - t0)
    bnorm2 = float(np.sum(bpad ** 2))
    print(
        f"unroll={u}: init {t_init:.2f}s  step first {t_first:.1f}s  "
        f"steady {min(ts)*1e3:.0f} ms/dispatch "
        f"({min(ts)*1e3/u:.0f} ms/Richardson-step)  "
        f"rel-resid now {np.sqrt(r2f/bnorm2):.2e}",
        flush=True,
    )
