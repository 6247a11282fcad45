"""Irregular unstructured-FEM generator (audikw_1/Fault_639 stand-in)
and its fill-quality + end-to-end solve gates.

Reference intent: BASELINE ladder rung 3 uses SuiteSparse irregular SPD
matrices; no network in this sandbox, so the in-repo generator supplies
the irregular-graph workload (VERDICT r4 missing item 4).
"""

import numpy as np
import pytest

from pastix_tpu.config import PastixConfig
from pastix_tpu.generators import irregular_fem_3d, poisson_3d
from pastix_tpu.order import compute_ordering
from pastix_tpu.pastix import Pastix


@pytest.fixture(scope="module")
def A():
    return irregular_fem_3d(1200, dof_nbr=3, seed=7)


def test_generator_is_irregular_and_spd(A):
    As = A.to_scipy()
    deg = np.diff(As.tocsr().indptr)
    # irregular degrees: real FEM graphs have a wide degree spread,
    # unlike the constant-stencil grids
    assert deg.max() > 2.0 * deg.mean()
    assert deg.std() > 3.0
    # symmetric + strictly diagonally dominant (=> SPD)
    assert (abs(As - As.T) > 1e-12).nnz == 0
    off = np.abs(As).sum(axis=1).A.ravel() - np.abs(As.diagonal())
    assert (As.diagonal() > off).all()


def test_fill_quality_vs_amd(A):
    from tests.test_fill_quality import _nnz_l, _nnz_l_scipy

    o = compute_ordering(A.pattern_sym_scipy(), PastixConfig())
    o.check()
    ratio = _nnz_l(A, o) / _nnz_l_scipy(A)
    assert ratio <= 1.5, f"fill {ratio:.2f}x exceeds the 1.5x gate"


def test_end_to_end_solve(A):
    s = Pastix(A, PastixConfig(tile_size=32))
    b = A.to_scipy() @ np.ones(A.n)
    x = s.solve(b)
    r = np.linalg.norm(b - A.to_scipy() @ x) / np.linalg.norm(b)
    assert r < 1e-10


def test_determinism():
    A1 = irregular_fem_3d(400, seed=3)
    A2 = irregular_fem_3d(400, seed=3)
    assert A1.nnz == A2.nnz
    assert np.array_equal(A1.values, A2.values)
