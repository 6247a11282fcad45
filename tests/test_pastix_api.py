"""Top-level API tests: one-call solve, step-by-step pattern reuse,
refinement to reference-grade residual, Schur complement
(reference examples simple.c / step-by-step.c / schur.c as tests —
SURVEY.md §4 point 1)."""

import numpy as np
import pytest
import scipy.sparse as sp

from pastix_tpu import generators as gen
from pastix_tpu.config import (
    Factorization,
    PastixConfig,
    RefinementMethod,
)
from pastix_tpu.pastix import Pastix, spsolve, pastix


def test_spsolve_laplacian_fp32_refined(rng):
    """BASELINE config 1 (scaled down): fp32 factors + refinement must reach
    reference-grade residual (DPARM_EPSILON_REFINEMENT)."""
    A = gen.laplacian_2d(32)
    x_true = rng.standard_normal(A.n)
    b = A.to_scipy() @ x_true
    cfg = PastixConfig(compute_dtype="float32", refinement_eps=1e-12)
    solver = Pastix(A, cfg)
    x = solver.solve(b)
    r = np.linalg.norm(b - A.to_scipy() @ x) / np.linalg.norm(b)
    assert r < 1e-12, solver.report.summary()
    assert solver.report.refine_iters < 30


@pytest.mark.parametrize("method", [RefinementMethod.SIMPLE, RefinementMethod.CG,
                                    RefinementMethod.GMRES, RefinementMethod.BICGSTAB])
def test_refinement_methods(rng, method):
    A = gen.poisson_3d(6)
    b = A.to_scipy() @ rng.standard_normal(A.n)
    cfg = PastixConfig(compute_dtype="float32", refinement=method,
                       refinement_eps=1e-11)
    x = Pastix(A, cfg).solve(b)
    r = np.linalg.norm(b - A.to_scipy() @ x) / np.linalg.norm(b)
    assert r < 1e-11


def test_step_by_step_pattern_reuse(rng):
    """Same pattern, new values: re-factorize without re-analysis."""
    A = gen.laplacian_2d(16)
    solver = Pastix(A, PastixConfig(compute_dtype="float64",
                                    refinement=RefinementMethod.NONE))
    solver.order()
    solver.symbfact()
    solver.analyze()
    solver.factorize()
    b = A.to_scipy() @ np.ones(A.n)
    x1 = solver.solve(b)
    assert np.allclose(x1, 1.0, atol=1e-10)
    # scale values by 2: solution halves; analysis must be reused
    analyze_time_before = solver.report.analyze_time
    solver.factorize(values=A.values * 2.0)
    x2 = solver.solve(b)
    assert np.allclose(x2, 0.5, atol=1e-10)
    assert solver.report.analyze_time == analyze_time_before


def test_lu_via_api(rng):
    A = gen.random_unsym(200, 0.03, seed=2)
    b = A.to_scipy() @ rng.standard_normal(A.n)
    cfg = PastixConfig(factorization=Factorization.LU, compute_dtype="float32",
                       refinement=RefinementMethod.GMRES, refinement_eps=1e-11)
    x = Pastix(A, cfg).solve(b)
    r = np.linalg.norm(b - A.to_scipy() @ x) / np.linalg.norm(b)
    assert r < 1e-11


def test_functional_pastix_signature(rng):
    A = gen.laplacian_2d(10)
    b = A.to_scipy() @ np.ones(A.n)
    x, report = pastix(A.n, A.colptr, A.rowind, A.values, b,
                       PastixConfig(compute_dtype="float64"))
    assert np.allclose(x, 1.0, atol=1e-9)
    assert report.residual < 1e-10
    assert report.nnz_l_exact > 0


def test_schur_complement(rng):
    """Schur complement vs dense reference: S = A22 - A21 A11^{-1} A12."""
    A = gen.laplacian_2d(12)
    n = A.n
    schur_idx = np.arange(n - 17, n)  # deliberately not tile-aligned
    cfg = PastixConfig(compute_dtype="float64",
                       refinement=RefinementMethod.NONE)
    solver = Pastix(A, cfg)
    solver.set_schur_unknowns(schur_idx)
    solver.factorize()
    S = solver.get_schur()
    Ad = A.to_scipy().toarray()
    rest = np.setdiff1d(np.arange(n), schur_idx)
    # reorder rest by the solver's internal permutation-free definition
    A11 = Ad[np.ix_(rest, rest)]
    A12 = Ad[np.ix_(rest, schur_idx)]
    A22 = Ad[np.ix_(schur_idx, schur_idx)]
    S_ref = A22 - A12.T @ np.linalg.solve(A11, A12)
    assert np.allclose(S, S_ref, atol=1e-8), np.abs(S - S_ref).max()


def test_schur_full_solve(rng):
    A = gen.laplacian_2d(12)
    n = A.n
    b = A.to_scipy() @ rng.standard_normal(n)
    cfg = PastixConfig(compute_dtype="float64", refinement=RefinementMethod.NONE)
    solver = Pastix(A, cfg)
    solver.set_schur_unknowns(np.arange(n - 9, n))
    x = solver.solve_with_schur(b)
    r = np.linalg.norm(b - A.to_scipy() @ x) / np.linalg.norm(b)
    assert r < 1e-10


def test_report_fields(rng):
    A = gen.laplacian_2d(16)
    b = A.to_scipy() @ np.ones(A.n)
    solver = Pastix(A, PastixConfig(compute_dtype="float32"))
    solver.solve(b)
    rep = solver.report
    assert rep.n == A.n and rep.nnz_a == A.nnz
    assert rep.nnz_l >= rep.nnz_l_exact > 0
    assert rep.fact_time > 0 and rep.fact_flops > 0
    assert rep.residual < 1e-10
    assert "residual" in rep.summary()


def test_io_strategy_save_load(tmp_path, rng):
    A = gen.laplacian_2d(12)
    b = A.to_scipy() @ np.ones(A.n)
    from pastix_tpu.config import IOStrategy

    cfg = PastixConfig(compute_dtype="float64", io_strategy=IOStrategy.SAVE,
                       io_dir=str(tmp_path))
    Pastix(A, cfg).solve(b)
    cfg2 = PastixConfig(compute_dtype="float64", io_strategy=IOStrategy.LOAD,
                        io_dir=str(tmp_path))
    x = Pastix(A, cfg2).solve(b)
    assert np.allclose(x, 1.0, atol=1e-9)


def test_config_from_iparm_slots():
    """Reference-style IPARM_/DPARM_ slot names map onto the typed config."""
    from pastix_tpu.config import (
        Factorization,
        PastixConfig,
        RefinementMethod,
    )

    c = PastixConfig.from_iparm(
        {"IPARM_FACTORIZATION": "API_FACT_LDLT", "IPARM_ITERMAX": 99,
         "IPARM_REFINEMENT": "API_RAF_GRAD"},
        {"DPARM_EPSILON_REFINEMENT": 1e-12},
    )
    assert c.factorization == Factorization.LDLT
    assert c.refinement == RefinementMethod.CG
    assert c.refinement_itermax == 99 and c.refinement_eps == 1e-12
    import pytest

    with pytest.raises(ValueError, match="unknown parameter slot"):
        PastixConfig.from_iparm({"IPARM_BOGUS": 1})


def test_report_to_iparm_slots():
    """Output slots under reference names (api.h output iparm/dparm)."""
    import pastix_tpu
    from pastix_tpu.generators import laplacian_2d

    A = laplacian_2d(12).to_scipy()
    b = A @ np.ones(A.shape[0])
    solver = pastix_tpu.Pastix(A)
    solver.solve(b)
    iparm, dparm = solver.report.to_iparm()
    assert iparm["IPARM_NNZEROS"] > 0
    assert iparm["IPARM_STATIC_PIVOTING"] == 0
    assert dparm["DPARM_FACT_TIME"] > 0
    assert dparm["DPARM_RELATIVE_ERROR"] < 1e-9
    assert dparm["DPARM_FILL_IN"] >= 1.0


def test_io_strategy_saves_layout_artifact(tmp_path):
    """IOStrategy persists the schedule too (Order/Symbol/LAYOUT — the
    SURVEY §5 checkpoint row; VERDICT r1 item 6): loading must skip the
    analyze build and produce an identical plan."""
    import os

    from pastix_tpu.analyze.layout import SolverLayout
    from pastix_tpu.config import IOStrategy

    A = gen.poisson_3d(8)
    b = A.to_scipy() @ np.ones(A.n)
    cfg = PastixConfig(io_strategy=IOStrategy.SAVE, io_dir=str(tmp_path),
                       tile_size=8)
    s1 = Pastix(A, cfg)
    x1 = s1.solve(b)
    assert os.path.exists(os.path.join(str(tmp_path), "layoutname.npz"))

    lay2 = SolverLayout.load(os.path.join(str(tmp_path), "layoutname"))
    lay2.check()
    assert lay2.npool == s1.layout.npool
    np.testing.assert_array_equal(lay2.keys, s1.layout.keys)
    assert len(lay2.levels) == len(s1.layout.levels)
    np.testing.assert_array_equal(
        lay2.levels[0].gemm_d, s1.layout.levels[0].gemm_d
    )

    cfg2 = PastixConfig(io_strategy=IOStrategy.LOAD, io_dir=str(tmp_path),
                        tile_size=8)
    s2 = Pastix(A, cfg2)
    x2 = s2.solve(b)
    assert np.abs(x2 - 1).max() < 1e-8
    np.testing.assert_allclose(x2, x1, rtol=1e-6, atol=1e-9)


def test_lu_fact_flops_getrf_convention():
    """DPARM_FACT_FLOPS for LU counts BOTH triangles: exactly 2x the
    Cholesky count of the same (symmetrized) pattern.  Regression for
    the round-5 correction — through round 4 the LU report used the
    Cholesky count and understated useful GF/s 2x (BASELINE 4g)."""
    from pastix_tpu.config import Factorization
    from pastix_tpu.generators import poisson_3d

    A = poisson_3d(10)
    b = A.to_scipy() @ np.ones(A.n)
    s_llt = Pastix(A, PastixConfig())
    s_llt.symbfact()
    s_lu = Pastix(A, PastixConfig(factorization=Factorization.LU))
    s_lu.symbfact()
    assert s_lu.report.fact_flops == 2 * s_llt.report.fact_flops
