"""ILU(k) preconditioner quality: block-ILU(k) vs scipy spilu (VERDICT r4
item 8 — reference kass SF_level.c scalar level-of-fill).

For each matrix: factor memory (stored coefficient terms) and GMRES
iteration counts to 1e-10.  Block granularity (T-wide tiles) makes each
unit of fill ~T^2 scalar terms, so block-ILU(k) buys its iteration counts
with more memory than scalar ILU(k); this quantifies the trade.

Run: python exp_ilu.py
"""
import time

import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla

import jax
jax.config.update("jax_platforms", "cpu")

import pastix_tpu
from pastix_tpu.config import PastixConfig, RefinementMethod
from pastix_tpu.generators import (
    laplacian_2d, poisson_3d, convection_diffusion_3d)


def block_ilu(A, k, T=16, kind=None, grain="block"):
    from pastix_tpu.config import Factorization

    cfg = PastixConfig(
        tile_size=T, incomplete=True, level_of_fill=k, ilu_grain=grain,
        refinement_itermax=500, refinement_eps=1e-10,
        factorization=kind or Factorization.LLT,
    )
    b = A.to_scipy() @ np.ones(A.n)
    s = pastix_tpu.Pastix(A, cfg)
    t0 = time.time()
    x = s.solve(b)
    res = np.linalg.norm(b - A.to_scipy() @ x) / np.linalg.norm(b)
    mem = (
        s.report.memory_terms if grain == "scalar"
        else s.layout.npool * T * T
    )
    return dict(iters=s.report.refine_iters, mem=mem, res=res,
                t=time.time() - t0)


def scipy_ilu(A, fill_factor, drop_tol):
    As = A.to_scipy().tocsc()
    b = As @ np.ones(A.n)
    t0 = time.time()
    ilu = spla.spilu(As, fill_factor=fill_factor, drop_tol=drop_tol)
    mem = ilu.L.nnz + ilu.U.nnz
    it = [0]

    def cb(_):
        it[0] += 1

    M = spla.LinearOperator(As.shape, ilu.solve)
    x, info = spla.gmres(As, b, rtol=1e-10, maxiter=500, M=M,
                         callback=cb, callback_type="pr_norm")
    res = np.linalg.norm(b - As @ x) / np.linalg.norm(b)
    return dict(iters=it[0], mem=mem, res=res, t=time.time() - t0,
                info=info)


from pastix_tpu.config import Factorization

mats = [
    ("laplacian_2d(48)", laplacian_2d(48), None),
    ("poisson_3d(16)", poisson_3d(16), None),
    ("convdiff_3d(14)", convection_diffusion_3d(14), Factorization.LU),
]
for name, A, kind in mats:
    print(f"=== {name}: n={A.n} nnz={A.nnz} ===", flush=True)
    for k in (0, 1, 2):
        try:
            r = block_ilu(A, k, kind=kind)
            print(f"  block-ILU({k}) T=16: iters={r['iters']:>4} "
                  f"mem={r['mem']:>9} terms  res={r['res']:.1e}", flush=True)
        except Exception as e:
            print(f"  block-ILU({k}): failed ({str(e)[:80]})")
    for k in (0, 1, 2):
        try:
            r = block_ilu(A, k, kind=kind, grain="scalar")
            print(f"  scalar-ILU({k}):     iters={r['iters']:>4} "
                  f"mem={r['mem']:>9} terms  res={r['res']:.1e}", flush=True)
        except Exception as e:
            print(f"  scalar-ILU({k}): failed ({str(e)[:80]})")
    for ff, dt in [(3, 1e-3), (10, 1e-4), (20, 1e-5)]:
        r = scipy_ilu(A, ff, dt)
        print(f"  spilu ff={ff} dt={dt:g}: iters={r['iters']:>4} "
              f"mem={r['mem']:>9} terms  res={r['res']:.1e}", flush=True)
