"""Ordering tests: permutation validity (orderCheck analog), etree/column
counts vs brute force, fill quality gates (SURVEY.md §4, §7 M1)."""

import numpy as np
import pytest
import scipy.sparse as sp

from pastix_tpu import generators as gen
from pastix_tpu.config import PastixConfig, OrderingMethod
from pastix_tpu.order import (
    compute_ordering,
    etree,
    postorder,
    col_counts,
    fundamental_supernodes,
    nested_dissection,
    Order,
)


def brute_nnz_cols(pat):
    """Reference symbolic factorization by column merging (O(nnz(L)))."""
    n = pat.shape[0]
    Ac = sp.csc_matrix(pat)
    cols = [
        set(
            Ac.indices[Ac.indptr[j] : Ac.indptr[j + 1]][
                Ac.indices[Ac.indptr[j] : Ac.indptr[j + 1]] >= j
            ].tolist()
        )
        | {j}
        for j in range(n)
    ]
    counts = np.zeros(n, dtype=np.int64)
    for j in range(n):
        s = cols[j]
        counts[j] = len(s)
        rest = sorted(x for x in s if x > j)
        if rest:
            cols[rest[0]] |= s - {j}
    return counts


@pytest.mark.parametrize("method", list(OrderingMethod)[:4])
def test_orderings_are_valid_permutations(method):
    A = gen.laplacian_2d(16)
    o = compute_ordering(A.pattern_sym_scipy(), method=method)
    o.check()


def test_order_check_rejects_bad():
    o = Order(
        permtab=np.array([0, 0, 1]),
        peritab=np.array([0, 1, 2]),
        rangtab=np.array([0, 3]),
    )
    with pytest.raises(ValueError):
        o.check()


def test_order_save_load(tmp_path):
    A = gen.laplacian_2d(10)
    o = compute_ordering(A.pattern_sym_scipy())
    p = str(tmp_path / "ord")
    o.save(p)
    o2 = Order.load(p)
    assert np.array_equal(o.permtab, o2.permtab)
    assert np.array_equal(o.rangtab, o2.rangtab)


@pytest.mark.parametrize("gen_fn", [lambda: gen.laplacian_2d(20),
                                    lambda: gen.poisson_3d(7),
                                    lambda: gen.random_spd(150, 0.05)])
def test_col_counts_exact(gen_fn):
    A = gen_fn()
    for method in (OrderingMethod.ND, OrderingMethod.NATURAL):
        o = compute_ordering(A.pattern_sym_scipy(), method=method)
        Ap = A.permuted(o.permtab).pattern_sym_scipy()
        parent = etree(Ap)
        post = postorder(parent)
        cc = col_counts(Ap, parent, post)
        assert np.array_equal(cc, brute_nnz_cols(Ap))


def test_nd_reduces_fill():
    """ND must beat natural ordering decisively on a 2D mesh (M1 gate)."""
    A = gen.laplacian_2d(32)
    pat = A.pattern_sym_scipy()

    def fill(perm):
        Ap = A.permuted(perm).pattern_sym_scipy()
        parent = etree(Ap)
        return col_counts(Ap, parent, postorder(parent)).sum()

    o = compute_ordering(pat, method=OrderingMethod.ND)
    f_nd = fill(o.permtab)
    f_nat = fill(np.arange(A.n))
    assert f_nd < 0.75 * f_nat, (f_nd, f_nat)


def test_fundamental_supernodes_partition():
    A = gen.laplacian_2d(12)
    o = compute_ordering(A.pattern_sym_scipy())
    Ap = A.permuted(o.permtab).pattern_sym_scipy()
    parent = etree(Ap)
    cc = col_counts(Ap, parent, postorder(parent))
    rng_ = fundamental_supernodes(parent, cc)
    assert rng_[0] == 0 and rng_[-1] == A.n
    assert np.all(np.diff(rng_) > 0)


def test_nd_disconnected_graph():
    # two independent components must both be ordered
    A1 = gen.laplacian_2d(6).to_scipy()
    A = sp.block_diag([A1, A1]).tocsc()
    from pastix_tpu.sparse import SparseMatrix

    M = SparseMatrix.from_scipy(A, symmetric_storage=True)
    o = compute_ordering(M.pattern_sym_scipy())
    o.check()
