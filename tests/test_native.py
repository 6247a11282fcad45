"""Native C++ ordering vs the Python reference implementation."""

import numpy as np
import pytest

from pastix_tpu.native import native_nested_dissection, get_lib
from pastix_tpu.order.nd import nested_dissection
from pastix_tpu.order.structs import Order
from pastix_tpu.symbolic.fax import symbolic_factorization
from pastix_tpu.generators import laplacian_2d, poisson_3d, random_spd

native_missing = get_lib() is None
pytestmark = pytest.mark.skipif(
    native_missing, reason="no native toolchain in this environment"
)


def _order_from(res, n):
    peri, rang = res
    perm = np.empty(n, np.int64)
    perm[peri] = np.arange(n)
    return Order(perm, peri, rang)


@pytest.mark.parametrize(
    "gen", [lambda: laplacian_2d(20), lambda: poisson_3d(10),
            lambda: random_spd(300, density=0.02, seed=7)]
)
def test_native_nd_valid_order(gen):
    A = gen()
    res = native_nested_dissection(A.pattern_sym_scipy())
    assert res is not None
    o = _order_from(res, A.n)
    o.check()
    assert o.rangtab[0] == 0 and o.rangtab[-1] == A.n
    assert np.all(np.diff(o.rangtab) > 0)


def test_native_nd_fill_quality_close_to_python():
    A = poisson_3d(12)
    pat = A.pattern_sym_scipy()
    o_n = _order_from(native_nested_dissection(pat), A.n)
    o_p = nested_dissection(pat)
    nnz_n = symbolic_factorization(
        A.permuted(o_n.permtab).pattern_sym_scipy(), o_n.rangtab
    ).nnz_l()
    nnz_p = symbolic_factorization(
        A.permuted(o_p.permtab).pattern_sym_scipy(), o_p.rangtab
    ).nnz_l()
    assert nnz_n <= 1.2 * nnz_p  # no more than 20% worse than the reference impl


def test_native_nd_disconnected_graph():
    import scipy.sparse as sp

    A = laplacian_2d(6).pattern_sym_scipy()
    Z = sp.block_diag([A, A]).tocsc()
    res = native_nested_dissection(Z)
    o = _order_from(res, Z.shape[0])
    o.check()


def test_native_end_to_end_solve():
    import pastix_tpu

    A = poisson_3d(8)
    b = A.to_scipy() @ np.ones(A.n)
    x = pastix_tpu.spsolve(A.to_scipy(), b)
    assert np.abs(x - 1).max() < 1e-8
