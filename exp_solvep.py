"""Stage breakdown of the flagship SOLVE (round-5 item: solve+refine 6.0s).

At the 1M flagship the follow-up contract reads solve_ms 647 and
refine_ms 5353 (8 iterations ~ 8 more solves).  Each sweep only moves
~10.6 GB of tiles and ~2.3 GFLOP of matvecs, so 647 ms is ~33 GB/s
effective -- far under the measured 425 GB/s XLA gather rate.  Where
does it go?  Times, as separate jitted programs (warm reps, element-read
sync):

  full   : the product fast-solve (fwd + tail + bwd)
  fwd    : _run_fwd_inv only
  bwd    : _run_bwd_inv only
  tail   : dense-tail gather + fwd + bwd triangular solves
  diagF  : fwd with only the diag-inverse applies (no panel updates)
  spmv   : device COO SpMV of A (the refine residual's other half)

Run: python exp_solvep.py [nx]
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
from pastix_tpu.config import PastixConfig

t0 = time.time()
A = poisson_3d(nx)
s = Pastix(A, PastixConfig(tile_size=128))
s.order(); s.symbfact(); s.analyze()
print(f"n={A.n} analyze {time.time()-t0:.1f}s levels={len(s.layout.levels)}",
      flush=True)
t0 = time.time()
s.factorize()
print(f"factorize (compile+run): {time.time()-t0:.1f}s", flush=True)

from pastix_tpu import solve as sm

lay = s.layout
f = s.factors
print(f"solve_fn_inv built by product: {s._solve_fn_inv is not None}; "
      f"dense-tail solve off: {getattr(s, '_dense_tail_solve_off', False)}",
      flush=True)

# classic plan WITHOUT the dense-tail fast path (what the product runs at
# the flagship: pool/HBM gate disables the inv path, 8*m^2 pre-check
# disables the tail solve)
plan = sm._solve_plan(lay, None)

b = np.ones(A.n)
bb = jnp.asarray(sm.rhs_to_blocks(lay, s._perm_rhs(b), dtype=np.float32))

fwd_c = jax.jit(lambda p, y: sm._run_fwd(plan, p, y, unit=False))
bwd_c = jax.jit(lambda p, y: sm._run_bwd(plan, p, p, y, lower_t=True,
                                         unit=False, conj=True))

# candidate: inverse-diag path (gate currently blocks it at this size)
from pastix_tpu.numeric.factorize import build_diag_inverse_fn
from pastix_tpu.config import Factorization
dinv_fn = build_diag_inverse_fn(lay, Factorization.LLT)
fwd_i = jax.jit(lambda p, dv, y: sm._run_fwd_inv(plan, p, dv, y))
bwd_i = jax.jit(lambda p, dv, y: sm._run_bwd_inv(plan, p, dv, y, True,
                                                 conj=True))

# diag-only forward (classic): per-level fixed cost floor
plan_d = []
for tag, t in plan:
    t2 = dict(t)
    if tag == "unroll":
        for k in ("tp", "tr", "tc"):
            t2[k] = t2[k][:0]
    plan_d.append((tag, t2))
diagF = jax.jit(lambda p, y: sm._run_fwd(plan_d, p, y, unit=False))

import scipy.sparse as sp
Ac = sp.coo_matrix(s._A_perm)
arow = jnp.asarray(Ac.row.astype(np.int32))
acol = jnp.asarray(Ac.col.astype(np.int32))
avals = jnp.asarray(Ac.data.astype(np.float32))
nflat = lay.nbc * lay.T


def spmv(x):
    xf = x.reshape(nflat, -1)
    yf = jnp.zeros_like(xf)
    yf = yf.at[arow].add(avals[:, None] * xf[acol])
    return yf.reshape(lay.nbc, lay.T, -1)


spmv_j = jax.jit(spmv)


def sync(x):
    jax.block_until_ready(x)
    return float(np.asarray(x)[-1].ravel()[-1])


def timeit(name, fn, *args, reps=3):
    t0 = time.time()
    out = fn(*args)
    sync(out)
    tc = time.time() - t0
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        sync(out)
        ts.append(time.time() - t0)
    print(f"{name:8s}: {min(ts)*1e3:8.1f} ms  (first {tc:.1f}s)", flush=True)
    return out


full = s._solve_fn
timeit("full_c", lambda y: full(f.pool, y), bb)
timeit("fwd_c", fwd_c, f.pool, bb)
timeit("bwd_c", bwd_c, f.pool, bb)
timeit("diagF_c", diagF, f.pool, bb)
dinv = timeit("dinv", dinv_fn, f.pool)
timeit("fwd_i", fwd_i, f.pool, dinv, bb)
timeit("bwd_i", bwd_i, f.pool, dinv, bb)
timeit("spmv", spmv_j, bb)
