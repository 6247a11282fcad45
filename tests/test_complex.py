"""Complex (c/z) precision support — the reference's s/d/c/z build matrix
(redefine_functions.h symbol machinery, API_SYM_HER, API_FACT_LDLTH;
SURVEY.md section 2 row 1)."""

import numpy as np
import pytest
import scipy.sparse as sp

import pastix_tpu
from pastix_tpu.config import Factorization, PastixConfig, Symmetry
from pastix_tpu.generators import laplacian_2d


def _hermitian_spd(n_side, seed=0):
    """Complex Hermitian positive-definite: Laplacian + i*skew part."""
    rng = np.random.default_rng(seed)
    L = laplacian_2d(n_side).to_scipy().astype(np.complex128)
    n = L.shape[0]
    # random sparse skew-Hermitian imaginary part on the Laplacian pattern
    C = sp.tril(L, -1).tocoo()
    vals = 0.2j * rng.standard_normal(C.nnz)
    S = sp.coo_matrix((vals, (C.row, C.col)), shape=(n, n)).tocsc()
    return (L + S + S.conj().T).tocsc()


def _complex_symmetric(n_side, seed=1):
    """Complex symmetric (A = A^T, not Hermitian), diagonally dominant."""
    rng = np.random.default_rng(seed)
    L = laplacian_2d(n_side).to_scipy().astype(np.complex128)
    n = L.shape[0]
    C = sp.tril(L, -1).tocoo()
    vals = 0.2j * rng.standard_normal(C.nnz)
    S = sp.coo_matrix((vals, (C.row, C.col)), shape=(n, n)).tocsc()
    return (L + S + S.T).tocsc()


def test_hermitian_llt():
    A = _hermitian_spd(10)
    assert abs(A - A.conj().T).max() < 1e-14
    rng = np.random.default_rng(3)
    xt = rng.standard_normal(A.shape[0]) + 1j * rng.standard_normal(A.shape[0])
    b = A @ xt
    cfg = PastixConfig(compute_dtype="complex128", symmetry=Symmetry.HERMITIAN)
    x = pastix_tpu.spsolve(A, b, config=cfg)
    assert np.abs(x - xt).max() / np.abs(xt).max() < 1e-8


def test_hermitian_ldlh():
    A = _hermitian_spd(8, seed=5)
    xt = np.ones(A.shape[0]) * (1 + 1j)
    b = A @ xt
    cfg = PastixConfig(
        compute_dtype="complex128", factorization=Factorization.LDLH,
        symmetry=Symmetry.HERMITIAN,
    )
    x = pastix_tpu.spsolve(A, b, config=cfg)
    assert np.abs(x - xt).max() / np.abs(xt).max() < 1e-8


def test_complex_symmetric_ldlt():
    A = _complex_symmetric(8)
    assert abs(A - A.T).max() < 1e-14
    xt = np.full(A.shape[0], 2.0 - 1.0j)
    b = A @ xt
    cfg = PastixConfig(
        compute_dtype="complex128", factorization=Factorization.LDLT,
    )
    x = pastix_tpu.spsolve(A, b, config=cfg)
    assert np.abs(x - xt).max() / np.abs(xt).max() < 1e-8


def test_complex_symmetric_llt():
    """Complex-symmetric LL^T (unconjugated Cholesky path)."""
    A = _complex_symmetric(6, seed=9)
    xt = np.full(A.shape[0], 1.0 + 0.5j)
    b = A @ xt
    cfg = PastixConfig(compute_dtype="complex128")
    x = pastix_tpu.spsolve(A, b, config=cfg)
    assert np.abs(x - xt).max() / np.abs(xt).max() < 1e-8


def test_complex_lu():
    rng = np.random.default_rng(11)
    n = 150
    from pastix_tpu.generators import random_unsym

    B = random_unsym(n, density=0.05, seed=4).to_scipy()
    A = (B + 1j * 0.3 * abs(B)).tocsc()
    xt = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    b = A @ xt
    cfg = PastixConfig(
        compute_dtype="complex128", factorization=Factorization.LU,
    )
    x = pastix_tpu.spsolve(A, b, config=cfg)
    assert np.abs(x - xt).max() / np.abs(xt).max() < 1e-8


def test_complex64_single_precision_with_refinement():
    A = _hermitian_spd(8, seed=2)
    xt = np.ones(A.shape[0]) + 0j
    b = A @ xt
    cfg = PastixConfig(compute_dtype="complex64", symmetry=Symmetry.HERMITIAN)
    x = pastix_tpu.spsolve(A, b, config=cfg)
    assert np.abs(x - xt).max() < 1e-8  # refinement closes the c32 gap


def test_helmholtz_generator_complex_symmetric():
    from pastix_tpu.generators import helmholtz_2d

    A = helmholtz_2d(16, k=8.0)
    S = A.to_scipy()
    assert abs(S - S.T).max() < 1e-14  # symmetric
    assert abs(S - S.conj().T).max() > 0  # not Hermitian (absorbing)
    xt = np.full(S.shape[0], 1.0 - 0.5j)
    b = S @ xt
    cfg = PastixConfig(
        compute_dtype="complex128", factorization=Factorization.LDLT
    )
    x = pastix_tpu.spsolve(S, b, config=cfg)
    assert np.abs(x - xt).max() < 1e-8
