"""Matrix driver round-trips (reference src/matrix_drivers — SURVEY.md §2 row 17)."""

import numpy as np
import pytest
import scipy.sparse as sp

from pastix_tpu import drivers
from pastix_tpu.generators import laplacian_2d, random_unsym


def _assert_same(A, B):
    d = (A.to_scipy() - B.to_scipy()).tocoo()
    assert abs(d.data).max() if d.nnz else 0 < 1e-12


def test_mm_roundtrip(tmp_path):
    A = laplacian_2d(8)
    p = str(tmp_path / "m.mtx")
    drivers.write_mm(p, A)
    B = drivers.read_matrix(p)
    _assert_same(A, B)


def test_hb_roundtrip(tmp_path):
    A = random_unsym(30, density=0.1, seed=3)
    p = str(tmp_path / "m.rua")
    drivers.write_hb(p, A)
    B = drivers.read_matrix(p)
    _assert_same(A, B)


def test_ijv_roundtrip(tmp_path):
    A = laplacian_2d(6)
    prefix = str(tmp_path / "m_")
    drivers.write_ijv(prefix, A)
    B = drivers.read_matrix(prefix, driver="ijv")
    _assert_same(A, B)


def test_petsc_roundtrip(tmp_path):
    A = random_unsym(25, density=0.15, seed=5)
    p = str(tmp_path / "m.petsc")
    drivers.write_petsc(p, A)
    B = drivers.read_matrix(p)
    _assert_same(A, B)


def test_generator_drivers():
    A = drivers.read_matrix("lap3:4")
    assert A.n == 64
    B = drivers.read_matrix("x", driver="lap:5")
    assert B.n == 25
    with pytest.raises(ValueError):
        drivers.read_matrix("nope.xyz")


def test_gen_rhs():
    A = laplacian_2d(5)
    b = drivers.gen_rhs(A, "ones")
    assert np.allclose(b, A.to_scipy() @ np.ones(A.n))
