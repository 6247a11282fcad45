"""Block ILU(k) incomplete factorization mode (reference kass SF_level +
IPARM_INCOMPLETE — SURVEY.md section 2 rows 5 and 14)."""

import numpy as np
import pytest
import scipy.sparse as sp

import pastix_tpu
from pastix_tpu.analyze.blocksym import tile_symbolic, tile_symbolic_ilu
from pastix_tpu.config import PastixConfig, Factorization, RefinementMethod
from pastix_tpu.generators import laplacian_2d, poisson_3d


def test_ilu_pattern_subset_and_monotone():
    A = laplacian_2d(12)
    pat = A.pattern_sym_scipy()
    T = 4
    full_r, full_c, _, nbc = tile_symbolic(pat, T)
    full = set(zip(full_r.tolist(), full_c.tolist()))
    prev = None
    for k in (0, 1, 2, 8):
        r, c, _, _ = tile_symbolic_ilu(pat, T, k)
        cur = set(zip(r.tolist(), c.tolist()))
        assert cur <= full
        if prev is not None:
            assert prev <= cur  # fill grows with k
        prev = cur
    # large k converges to the full pattern
    r, c, _, _ = tile_symbolic_ilu(pat, T, 50)
    assert set(zip(r.tolist(), c.tolist())) == full


def test_ilu0_pattern_is_tile_pattern_of_a():
    from pastix_tpu.analyze.blocksym import tile_pattern_of_a

    A = laplacian_2d(10)
    pat = A.pattern_sym_scipy()
    r, c, _, _ = tile_symbolic_ilu(pat, 4, 0)
    ar, ac, _ = tile_pattern_of_a(pat, 4)
    assert set(zip(r.tolist(), c.tolist())) == set(zip(ar.tolist(), ac.tolist()))


@pytest.mark.parametrize("k", [0, 1])
def test_ilu_preconditioned_solve(k):
    """ILU(k) + GMRES refinement reaches direct-solver-grade residual."""
    A = laplacian_2d(16)
    cfg = PastixConfig(
        incomplete=True, level_of_fill=k, refinement_itermax=400,
        refinement_eps=1e-10,
    )
    assert cfg.refinement == RefinementMethod.GMRES  # auto-upgraded
    b = A.to_scipy() @ np.ones(A.n)
    solver = pastix_tpu.Pastix(A, cfg)
    x = solver.solve(b)
    r = np.linalg.norm(b - A.to_scipy() @ x) / np.linalg.norm(b)
    assert r < 1e-8
    assert solver.report.refine_iters > 0  # genuinely iterative


def test_ilu_memory_smaller_than_direct():
    A = poisson_3d(8)
    pat = A.pattern_sym_scipy()
    rf, cf, _, _ = tile_symbolic(pat, 8)
    ri, ci, _, _ = tile_symbolic_ilu(pat, 8, 1)
    assert ri.size < rf.size


def test_as_preconditioner_scipy_interop():
    """The factored solve as a scipy LinearOperator (M= in user Krylov)."""
    from scipy.sparse.linalg import cg

    import pastix_tpu

    A = laplacian_2d(16)
    S = A.to_scipy().astype(np.float64)
    b = S @ np.ones(A.n)
    s = pastix_tpu.Pastix(A, PastixConfig(incomplete=True, level_of_fill=1))
    M = s.as_preconditioner()
    x, info = cg(S, b, M=M, rtol=1e-10, maxiter=200)
    assert info == 0
    assert np.linalg.norm(b - S @ x) / np.linalg.norm(b) < 1e-9


def test_ilu_quality_vs_scipy_spilu():
    """Preconditioner-quality evidence (VERDICT r4 item 8, reference
    SF_level.c): block-ILU(1) reaches scalar-ILU-grade GMRES iteration
    counts; the price of the 16-wide block granularity is ~3-4x the
    factor memory (measured in exp_ilu.py across three matrices — each
    unit of block fill is ~T^2 scalar terms)."""
    import scipy.sparse.linalg as spla

    A = poisson_3d(12)
    As = A.to_scipy().tocsc()
    b = As @ np.ones(A.n)

    cfg = PastixConfig(
        tile_size=16, incomplete=True, level_of_fill=1,
        refinement_itermax=400, refinement_eps=1e-10,
    )
    s = pastix_tpu.Pastix(A, cfg)
    x = s.solve(b)
    res = np.linalg.norm(b - As @ x) / np.linalg.norm(b)
    assert res < 1e-8
    blk_iters = s.report.refine_iters
    blk_mem = s.layout.npool * 16 * 16

    ilu = spla.spilu(As, fill_factor=10, drop_tol=1e-4)
    it = [0]
    M = spla.LinearOperator(As.shape, ilu.solve)
    xs, info = spla.gmres(
        As, b, rtol=1e-10, maxiter=400, M=M,
        callback=lambda *_: it.__setitem__(0, it[0] + 1),
        callback_type="pr_norm",
    )
    sp_iters = max(it[0], 1)
    sp_mem = ilu.L.nnz + ilu.U.nnz
    # iteration parity within 2x of scalar ILU at this fill grade...
    assert blk_iters <= 2 * sp_iters + 10, (blk_iters, sp_iters)
    # ...bought with bounded (<6x) extra memory — the documented trade
    assert blk_mem <= 6 * sp_mem, (blk_mem, sp_mem)


# ---------------------------------------------------------------------------
# scalar-grain ILU(k) (reference SF_level.c's actual granularity;
# VERDICT r4 item 9 — close the block-grain memory penalty)
# ---------------------------------------------------------------------------


def test_scalar_ilu_pattern_ilu0_is_a_and_monotone():
    from pastix_tpu.analyze.scalar_ilu import scalar_ilu_pattern

    A = laplacian_2d(12)
    pat = A.pattern_sym_scipy()
    r0, c0 = scalar_ilu_pattern(pat, 0)
    base = sp.tril(pat).tocoo()
    assert set(zip(r0.tolist(), c0.tolist())) == set(
        zip(base.row.tolist(), base.col.tolist())
    )
    prev = None
    for k in (0, 1, 3):
        r, c = scalar_ilu_pattern(pat, k)
        cur = set(zip(r.tolist(), c.tolist()))
        if prev is not None:
            assert prev <= cur
        prev = cur


def test_scalar_ilu_full_fill_is_exact_factorization():
    """With k >= height of the etree the pattern is the complete fill and
    the IKJ numeric is an EXACT LU: the un-refined solve must already be
    direct-solver grade."""
    A = laplacian_2d(10)
    cfg = PastixConfig(
        incomplete=True, level_of_fill=1000, ilu_grain="scalar",
    )
    b = A.to_scipy() @ np.ones(A.n)
    s = pastix_tpu.Pastix(A, cfg)
    x = s.solve(b, refine=False)
    r = np.linalg.norm(b - A.to_scipy() @ x) / np.linalg.norm(b)
    assert r < 1e-10


@pytest.mark.parametrize("kind", [None, Factorization.LU])
def test_scalar_ilu_preconditioned_solve(kind):
    from pastix_tpu.generators import convection_diffusion_3d

    A = convection_diffusion_3d(10) if kind else laplacian_2d(16)
    cfg = PastixConfig(
        incomplete=True, level_of_fill=1, ilu_grain="scalar",
        refinement_itermax=400, refinement_eps=1e-10,
        factorization=kind or Factorization.LLT,
    )
    b = A.to_scipy() @ np.ones(A.n)
    s = pastix_tpu.Pastix(A, cfg)
    x = s.solve(b)
    r = np.linalg.norm(b - A.to_scipy() @ x) / np.linalg.norm(b)
    assert r < 1e-8
    assert s.report.refine_iters > 0
    assert s.report.memory_terms > 0


def test_scalar_ilu_memory_beats_spilu_at_matched_iterations():
    """The VERDICT r4 item-9 gate: <=2x memory vs scipy spilu at matched
    iteration counts.  Measured across three matrices in exp_ilu.py the
    scalar grain is ~0.3x; this asserts the gate with margin on one."""
    import scipy.sparse.linalg as spla

    A = poisson_3d(12)
    As = A.to_scipy().tocsc()
    b = As @ np.ones(A.n)

    cfg = PastixConfig(
        incomplete=True, level_of_fill=1, ilu_grain="scalar",
        refinement_itermax=400, refinement_eps=1e-10,
    )
    s = pastix_tpu.Pastix(A, cfg)
    x = s.solve(b)
    assert np.linalg.norm(b - As @ x) / np.linalg.norm(b) < 1e-8
    sc_iters, sc_mem = s.report.refine_iters, s.report.memory_terms

    ilu = spla.spilu(As, fill_factor=10, drop_tol=1e-4)
    it = [0]
    M = spla.LinearOperator(As.shape, ilu.solve)
    spla.gmres(
        As, b, rtol=1e-10, maxiter=400, M=M,
        callback=lambda *_: it.__setitem__(0, it[0] + 1),
        callback_type="pr_norm",
    )
    sp_iters, sp_mem = max(it[0], 1), ilu.L.nnz + ilu.U.nnz
    assert sc_iters <= 2 * sp_iters + 10, (sc_iters, sp_iters)
    assert sc_mem <= 2 * sp_mem, (sc_mem, sp_mem)


def test_scalar_ilu_as_preconditioner_interop():
    from scipy.sparse.linalg import cg

    A = laplacian_2d(16)
    S = A.to_scipy().astype(np.float64)
    b = S @ np.ones(A.n)
    s = pastix_tpu.Pastix(
        A, PastixConfig(incomplete=True, level_of_fill=1, ilu_grain="scalar")
    )
    M = s.as_preconditioner()
    x, info = cg(S, b, M=M, rtol=1e-10, maxiter=200)
    assert info == 0
    assert np.linalg.norm(b - S @ x) / np.linalg.norm(b) < 1e-9
