"""Block host refinement: every Krylov method refines the whole (n, R)
RHS block with SHARED factored solves per iteration (VERDICT r2 next #7;
reference src/sopalin/src/raff.c refines the block, not per column)."""

import numpy as np
import pytest

from pastix_tpu import Pastix, PastixConfig
from pastix_tpu.config import RefinementMethod
from pastix_tpu.generators import laplacian_2d, poisson_3d
from pastix_tpu.refine import refine


def _counted_system(n=400, R=8, seed=0):
    import scipy.sparse as sp

    rng = np.random.default_rng(seed)
    A = laplacian_2d(20).to_scipy().astype(np.float64)
    n = A.shape[0]
    B = A @ rng.standard_normal((n, R))
    calls = {"n": 0}

    def matvec(v):
        return A @ v

    def precond(v):
        calls["n"] += 1
        # a deliberately-lossy preconditioner (fp32 LU-ish): forces a few
        # refinement iterations like the real fp32-factor finish
        from scipy.sparse.linalg import splu

        if "lu" not in calls:
            calls["lu"] = splu(A.tocsc().astype(np.float32))
        return calls["lu"].solve(np.asarray(v, np.float32)).astype(np.float64)

    return A, B, matvec, precond, calls


@pytest.mark.parametrize("method", [
    RefinementMethod.SIMPLE, RefinementMethod.CG,
    RefinementMethod.GMRES, RefinementMethod.BICGSTAB,
])
def test_block_refine_shared_solves(method):
    """Solve-call count must be independent of nrhs (one factored solve
    per iteration serves all 8 columns) and the block must converge."""
    A, B, matvec, precond, calls = _counted_system(R=8)
    x0 = np.asarray(precond(B), np.float64)
    calls["n"] = 0
    res = refine(matvec, precond, B, x0, method=method, eps=1e-11,
                 itermax=60)
    assert res.converged, f"{method}: residual {res.residual:.2e}"
    block_calls = calls["n"]

    calls["n"] = 0
    res1 = refine(matvec, precond, B[:, 0], x0[:, 0], method=method,
                  eps=1e-11, itermax=60)
    assert res1.converged
    col_calls = calls["n"]
    # block refinement may need a couple extra iterations for the worst
    # column, but NOT R times the solves of one column
    assert block_calls <= 3 * col_calls, (
        f"{method}: {block_calls} block solves vs {col_calls} per-column"
    )
    rtrue = np.linalg.norm(B - A @ res.x, axis=0) / np.linalg.norm(B, axis=0)
    assert rtrue.max() < 1e-10


def test_block_gmres_end_to_end_multirhs():
    """Public API: nrhs=8 GMRES-refined solve reaches reference-grade
    residual on every column."""
    A = poisson_3d(8)
    S = A.to_scipy()
    rng = np.random.default_rng(3)
    B = S @ rng.standard_normal((A.n, 8))
    s = Pastix(A, PastixConfig(
        tile_size=8, refinement=RefinementMethod.GMRES,
        refinement_eps=1e-11,
    ))
    X = s.solve(B)
    res = np.linalg.norm(S @ X - B, axis=0) / np.linalg.norm(B, axis=0)
    assert res.max() < 1e-10


def test_block_refine_mixed_converged_columns():
    """A column that starts converged (b column already solved exactly)
    must not poison the others (guarded per-column recurrences)."""
    A, B, matvec, precond, calls = _counted_system(R=4)
    x0 = np.asarray(precond(B), np.float64)
    # make column 2 exact from the start
    import scipy.sparse.linalg as spl
    x0[:, 2] = spl.spsolve(A.tocsc(), B[:, 2])
    res = refine(matvec, precond, B, x0, method=RefinementMethod.CG,
                 eps=1e-11, itermax=60)
    rtrue = np.linalg.norm(B - A @ res.x, axis=0) / np.linalg.norm(B, axis=0)
    assert rtrue.max() < 1e-10
