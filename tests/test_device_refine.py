"""Fused device solve + Richardson refinement (build_solve_refine_fn):
one dispatch replaces the per-iteration host round trips."""

import numpy as np

from pastix_tpu.config import PastixConfig, Factorization, RefinementMethod
from pastix_tpu.generators import poisson_3d, laplacian_2d
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
    # not built for LDLT
    s2 = Pastix(
        A, PastixConfig(tile_size=16, factorization=Factorization.LDLT)
    )
    s2.factorize()
    assert s2._devref_fn is None
    assert np.abs(s2.solve(b) - 1).max() < 1e-8
    # CG refinement path bypasses the fused program
    s3 = Pastix(
        A,
        PastixConfig(tile_size=16, refinement=RefinementMethod.CG),
    )
    assert np.abs(s3.solve(b) - 1).max() < 1e-8
