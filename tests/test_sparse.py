"""Tests for the sparse container, check_matrix, and generators
(reference test model: pastix_checkMatrix invariants — SURVEY.md §4)."""

import numpy as np
import pytest
import scipy.sparse as sp

from pastix_tpu.sparse import SparseMatrix, check_matrix
from pastix_tpu import generators as gen


def test_check_matrix_sorts_and_dedupes():
    # column 0: rows [2, 0, 2] with duplicate to merge
    colptr = np.array([0, 3, 4])
    rowind = np.array([2, 0, 2])
    vals = np.array([1.0, 2.0, 3.0])
    with pytest.raises(ValueError):
        check_matrix(2, colptr, rowind, vals)  # row 2 out of range for n=2
    A = check_matrix(3, np.array([0, 3, 4, 4]), np.array([2, 0, 2, 1]),
                     np.array([1.0, 2.0, 3.0, 4.0]))
    S = A.to_scipy()
    assert S[2, 0] == 4.0  # 1 + 3 merged
    assert S[0, 0] == 2.0
    assert np.all(np.diff(A.rowind[A.colptr[0]:A.colptr[1]]) > 0)


def test_check_matrix_base1():
    A = check_matrix(2, np.array([1, 2, 3]), np.array([1, 2]),
                     np.array([5.0, 6.0]), base=1)
    S = A.to_scipy()
    assert S[0, 0] == 5.0 and S[1, 1] == 6.0


def test_symmetric_storage_roundtrip():
    A = gen.laplacian_2d(8)
    assert A.symmetric_storage
    S = A.to_scipy()
    assert (S != S.T).nnz == 0
    assert np.allclose(S.diagonal(), 4.0)


def test_symmetrize_pattern_for_lu():
    # structurally unsymmetric input gains explicit zeros
    A = sp.csc_matrix(np.array([[1.0, 2.0], [0.0, 3.0]]))
    M = check_matrix(2, A.indptr, A.indices, A.data, symmetrize_pattern=True)
    S = M.lower_scipy()
    assert M.nnz == 4  # (1,0) added as explicit zero


def test_generators_spd():
    for A in [gen.laplacian_1d(10), gen.laplacian_2d(6), gen.poisson_3d(4),
              gen.elasticity_3d(3), gen.random_spd(50, 0.1)]:
        S = A.to_scipy().toarray()
        assert np.allclose(S, S.T)
        w = np.linalg.eigvalsh(S)
        assert w.min() > 0, "generator must be SPD"


def test_permuted():
    A = gen.laplacian_2d(5)
    perm = np.random.default_rng(0).permutation(A.n)
    Ap = A.permuted(perm)
    S, Sp = A.to_scipy().toarray(), Ap.to_scipy().toarray()
    assert np.allclose(Sp[np.ix_(perm, perm)], S)


def test_convection_diffusion_unsymmetric():
    """Nonsymmetric values on the symmetric 7-point pattern (BASELINE
    rung-4 generated stand-in for CFD-class LU matrices)."""
    from pastix_tpu.generators import convection_diffusion_3d

    A = convection_diffusion_3d(6, peclet=20.0).to_scipy()
    assert (A != A.T).nnz > 0  # genuinely nonsymmetric values
    assert ((A != 0).astype(int) != (A.T != 0).astype(int)).nnz == 0  # pattern symmetric
    # solvable by our LU end-to-end
    import numpy as np

    from pastix_tpu import Pastix, PastixConfig
    from pastix_tpu.config import Factorization
    from pastix_tpu.generators import convection_diffusion_3d as cd

    Am = cd(8)
    b = Am.to_scipy() @ np.ones(Am.n)
    x = Pastix(
        Am, PastixConfig(tile_size=8, factorization=Factorization.LU)
    ).solve(b)
    assert np.abs(x - 1).max() < 1e-8
