"""Fused device solve + refinement: the whole refinement loop — Richardson,
CG, BiCGStab or GMRES(m) — runs in one device program with the factored
solve inlined as preconditioner (pastix_tpu/krylov.py; reference raff.c
method dispatch, SURVEY.md section 3.5).  One dispatch replaces the
per-iteration host round trips."""

import numpy as np
import pytest

from pastix_tpu.config import PastixConfig, Factorization, RefinementMethod
from pastix_tpu.generators import poisson_3d, laplacian_2d, random_unsym
from pastix_tpu.pastix import Pastix


def test_fused_reaches_fp32_floor():
    A = poisson_3d(10)
    b = A.to_scipy() @ np.ones(A.n)
    s = Pastix(A, PastixConfig(tile_size=16))
    s.factorize()
    assert s._devref_fn is not None and s._a_coo_dev is not None
    x_ext, it = s._device_solve_refined(s._perm_rhs(b))
    r = s._perm_rhs(b) - s._A_perm64 @ x_ext
    res = np.linalg.norm(r) / np.linalg.norm(b)
    assert res < 1e-5
    assert 0 <= it <= 8  # stagnation check keeps it from grinding


def test_fused_end_to_end_matches_config_eps():
    A = laplacian_2d(24)
    As = A.to_scipy()
    b = As @ np.arange(1.0, A.n + 1)
    s = Pastix(A, PastixConfig(tile_size=16, refinement_eps=1e-10))
    x = s.solve(b)
    assert np.linalg.norm(b - As @ x) / np.linalg.norm(b) < 1e-10


def test_fused_multi_rhs():
    A = poisson_3d(8)
    As = A.to_scipy()
    B = As @ np.random.default_rng(3).standard_normal((A.n, 5))
    s = Pastix(A, PastixConfig(tile_size=16))
    X = s.solve(B)
    assert np.linalg.norm(B - As @ X) / np.linalg.norm(B) < 1e-10


def test_devref_disabled_paths():
    A = poisson_3d(8)
    b = A.to_scipy() @ np.ones(A.n)
    # off by config
    s = Pastix(A, PastixConfig(tile_size=16, device_refine=False))
    s.factorize()
    assert s._devref_fn is None
    assert np.abs(s.solve(b) - 1).max() < 1e-8
    # off when refinement is off
    s2 = Pastix(
        A,
        PastixConfig(
            tile_size=16, refinement=RefinementMethod.NONE, fast_solve=True
        ),
    )
    s2.factorize()
    assert s2._devref_fn is None


@pytest.mark.parametrize(
    "method",
    [RefinementMethod.CG, RefinementMethod.BICGSTAB, RefinementMethod.GMRES],
)
def test_device_krylov_llt(method):
    """Each Krylov method runs fused on device and the end-to-end solve
    still reaches reference-grade eps (host fp64 loop finishes if the
    fp32 device floor is above eps)."""
    A = poisson_3d(9)
    As = A.to_scipy()
    b = As @ np.arange(1.0, A.n + 1) / A.n
    s = Pastix(A, PastixConfig(tile_size=16, refinement=method))
    s.factorize()
    assert s._devref_fn is not None
    x = s.solve(b)
    assert np.linalg.norm(b - As @ x) / np.linalg.norm(b) < 1e-10
    assert s.report.refine_iters >= 1  # device iterations were counted


def test_device_refine_ldlt():
    A = poisson_3d(8)
    As = A.to_scipy()
    b = As @ np.ones(A.n)
    s = Pastix(
        A,
        PastixConfig(
            tile_size=16,
            factorization=Factorization.LDLT,
            refinement=RefinementMethod.CG,
        ),
    )
    s.factorize()
    assert s._devref_fn is not None
    x = s.solve(b)
    assert np.abs(x - 1).max() < 1e-8


@pytest.mark.parametrize(
    "method", [RefinementMethod.BICGSTAB, RefinementMethod.GMRES]
)
def test_device_refine_lu_unsym(method):
    A = random_unsym(300, density=0.02, seed=7)
    As = A.to_scipy()
    rng = np.random.default_rng(0)
    xref = rng.standard_normal(A.n)
    b = As @ xref
    s = Pastix(
        A,
        PastixConfig(
            tile_size=16,
            factorization=Factorization.LU,
            refinement=method,
        ),
    )
    s.factorize()
    assert s._devref_fn is not None
    x = s.solve(b)
    assert np.linalg.norm(b - As @ x) / np.linalg.norm(b) < 1e-10


def test_device_gmres_multirhs_falls_back():
    """Device GMRES is single-RHS: block RHS takes the host path and still
    converges."""
    A = poisson_3d(7)
    As = A.to_scipy()
    B = As @ np.random.default_rng(1).standard_normal((A.n, 3))
    s = Pastix(
        A, PastixConfig(tile_size=16, refinement=RefinementMethod.GMRES)
    )
    X = s.solve(B)
    assert np.linalg.norm(B - As @ X) / np.linalg.norm(B) < 1e-10


def test_device_gmres_ilu_preconditioner():
    """ILU(k) incomplete factors as the inlined preconditioner of the
    device GMRES loop (the reference IPARM_INCOMPLETE + API_RAF_GMRES
    pairing)."""
    A = laplacian_2d(20)
    As = A.to_scipy()
    b = As @ np.ones(A.n)
    s = Pastix(
        A, PastixConfig(tile_size=16, incomplete=True, level_of_fill=1)
    )
    assert s.config.refinement == RefinementMethod.GMRES
    s.factorize()
    assert s._devref_fn is not None
    x = s.solve(b)
    assert np.abs(x - 1).max() < 1e-7


def test_gmres_multi_rhs_block():
    """Device GMRES now refines the whole RHS block in lockstep
    (reference raff.c refines the full block; VERDICT r1 item 8)."""
    A = poisson_3d(8)
    As = A.to_scipy()
    rng = np.random.default_rng(7)
    B = As @ rng.standard_normal((A.n, 4))
    s = Pastix(
        A,
        PastixConfig(
            tile_size=16,
            refinement=RefinementMethod.GMRES,
            refinement_eps=1e-7,
        ),
    )
    X = s.solve(B)
    assert s._devref_fn is not None
    res = np.linalg.norm(B - As @ X) / np.linalg.norm(B)
    assert res < 1e-7


def test_multi_rhs_refined_cost_ratio():
    """nrhs=8 refined solve must cost <= 2x nrhs=1 (block refinement, not
    per-column host loops)."""
    import time

    A = poisson_3d(8)
    As = A.to_scipy()
    rng = np.random.default_rng(11)
    b1 = As @ rng.standard_normal((A.n, 1))
    B8 = As @ rng.standard_normal((A.n, 8))
    s = Pastix(A, PastixConfig(tile_size=16, refinement_eps=1e-8))
    s.factorize()
    # warm both compiled shapes, then time the steady state
    s.solve(b1), s.solve(B8)
    t1 = min(
        (lambda t0=time.perf_counter(): (s.solve(b1), time.perf_counter() - t0)[1])()
        for _ in range(3)
    )
    t8 = min(
        (lambda t0=time.perf_counter(): (s.solve(B8), time.perf_counter() - t0)[1])()
        for _ in range(3)
    )
    assert t8 <= 2.0 * t1 + 0.05, (t1, t8)
