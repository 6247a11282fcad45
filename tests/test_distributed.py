"""Distributed-input (CSCD / dpastix) assembly path — SURVEY.md §3.2."""

import numpy as np
import pytest
import scipy.sparse as sp

from pastix_tpu.distributed import (
    CSCDPart,
    assemble_distributed,
    dspsolve,
    gather_rhs,
    scatter_solution,
)
from pastix_tpu.generators import laplacian_2d


def _split_parts(A, nparts=3, local=True):
    """Split a matrix's entries into COO chunks, optionally local-indexed."""
    C = sp.coo_matrix(A)
    n = A.shape[0]
    chunks = np.array_split(np.arange(C.nnz), nparts)
    parts = []
    for ch in chunks:
        r, c, v = C.row[ch], C.col[ch], C.data[ch]
        if local:
            gl = np.unique(np.concatenate([r, c]))
            g2l = {g: i for i, g in enumerate(gl)}
            parts.append(
                CSCDPart(
                    rows=np.array([g2l[x] for x in r]),
                    cols=np.array([g2l[x] for x in c]),
                    vals=v.copy(),
                    loc2glob=gl,
                )
            )
        else:
            parts.append(CSCDPart(rows=r, cols=c, vals=v.copy()))
    return parts


@pytest.mark.parametrize("local", [True, False])
def test_assemble_matches_global(local):
    A = laplacian_2d(8).to_scipy()
    parts = _split_parts(A, 3, local=local)
    M = assemble_distributed(A.shape[0], parts)
    d = (M.to_scipy() - A).tocoo()
    assert d.nnz == 0 or abs(d.data).max() < 1e-14


def test_duplicates_across_parts_are_summed():
    A = laplacian_2d(6).to_scipy()
    parts = _split_parts(A * 0.5, 2, local=False)
    parts += _split_parts(A * 0.5, 2, local=True)  # same entries again
    M = assemble_distributed(A.shape[0], parts)
    d = (M.to_scipy() - A).tocoo()
    assert d.nnz == 0 or abs(d.data).max() < 1e-12


def test_dspsolve_roundtrip():
    A = laplacian_2d(10).to_scipy()
    n = A.shape[0]
    parts = _split_parts(A, 4, local=True)
    x_true = np.ones(n)
    b = A @ x_true
    # distribute b additively: each part carries b restricted to a disjoint
    # share of its local dofs (overlaps contribute zero)
    owned = np.full(n, -1)
    for i, p in enumerate(parts):
        for g in p.loc2glob:
            if owned[g] < 0:
                owned[g] = i
    b_parts = []
    for i, p in enumerate(parts):
        bp = np.where(owned[p.loc2glob] == i, b[p.loc2glob], 0.0)
        b_parts.append(bp)
    assert (owned >= 0).all()
    xs = dspsolve(n, parts, b_parts, rhs_mode="add")
    for p, xp in zip(parts, xs):
        assert np.abs(xp - x_true[p.loc2glob]).max() < 1e-8


def test_out_of_range_rejected():
    p = CSCDPart(rows=np.array([0]), cols=np.array([99]), vals=np.array([1.0]))
    with pytest.raises(ValueError, match="out of range"):
        assemble_distributed(10, [p])


def test_redispatch_column_ownership():
    from pastix_tpu.distributed import redispatch

    A = laplacian_2d(8).to_scipy()
    n = A.shape[0]
    parts = _split_parts(A, 3, local=True)
    # new ownership: round-robin columns over 2 target parts
    l2g0 = np.arange(0, n, 2)
    l2g1 = np.arange(1, n, 2)
    out = redispatch(n, parts, [l2g0, l2g1])
    assert len(out) == 2
    # every entry landed with its column's owner
    for k, p in enumerate(out):
        assert (p.cols % 2 == k).all()
    # the union reassembles the exact matrix (duplicates pre-summed)
    B = assemble_distributed(n, out).to_scipy()
    d = (B - A).tocoo()
    assert d.nnz == 0 or abs(d.data).max() < 1e-12
    # per-part duplicates are gone
    for p in out:
        key = p.rows * n + p.cols
        assert np.unique(key).size == key.size


def test_redispatch_overlap_rejected():
    from pastix_tpu.distributed import redispatch

    p = CSCDPart(rows=np.array([0]), cols=np.array([1]), vals=np.array([1.0]))
    with pytest.raises(ValueError, match="overlap"):
        redispatch(4, [p], [np.array([0, 1]), np.array([1, 2])])


def test_redispatch_keep_remote():
    from pastix_tpu.distributed import redispatch

    p = CSCDPart(
        rows=np.array([0, 2]), cols=np.array([0, 3]), vals=np.array([1.0, 2.0])
    )
    out = redispatch(4, [p], [np.array([0, 1])], keep_remote=True)
    assert len(out) == 2
    assert out[1].cols.tolist() == [3]  # unowned column collected


def test_cscd_addlocal_modes():
    from pastix_tpu.distributed import CSCDPart, cscd_addlocal

    a = CSCDPart(rows=np.array([0, 1, 1]), cols=np.array([0, 0, 1]),
                 vals=np.array([1.0, 2.0, 3.0]))
    b = CSCDPart(rows=np.array([1, 2]), cols=np.array([0, 2]),
                 vals=np.array([10.0, 5.0]))

    def as_dict(p):
        return {(int(r), int(c)): float(v)
                for r, c, v in zip(p.rows, p.cols, p.vals)}

    # reference semantics: b's (2,2) lies in a column absent from a -> dropped
    add = as_dict(cscd_addlocal(a, b, "add"))
    assert add == {(0, 0): 1.0, (1, 0): 12.0, (1, 1): 3.0}
    keep = as_dict(cscd_addlocal(a, b, "keep"))
    assert keep == {(0, 0): 1.0, (1, 0): 2.0, (1, 1): 3.0}
    ovw = as_dict(cscd_addlocal(a, b, "ovw"))
    assert ovw == {(0, 0): 1.0, (1, 0): 10.0, (1, 1): 3.0}


def test_cscd_addlocal_local_indices_and_dupes():
    from pastix_tpu.distributed import CSCDPart, cscd_addlocal

    # local indices via loc2glob; internal duplicates pre-summed
    a = CSCDPart(rows=np.array([0, 0]), cols=np.array([0, 0]),
                 vals=np.array([1.0, 1.5]), loc2glob=np.array([3]))
    b = CSCDPart(rows=np.array([0]), cols=np.array([1]),
                 vals=np.array([4.0]), loc2glob=np.array([3, 5]))
    out = cscd_addlocal(a, b, "add")
    d = {(int(r), int(c)): float(v)
         for r, c, v in zip(out.rows, out.cols, out.vals)}
    # column 5 is not in a's column set -> b's (3,5) entry is dropped
    assert d == {(3, 3): 2.5}


def test_cscd_addlocal_bad_mode():
    from pastix_tpu.distributed import CSCDPart, cscd_addlocal

    p = CSCDPart(rows=np.array([0]), cols=np.array([0]),
                 vals=np.array([1.0]))
    with pytest.raises(ValueError):
        cscd_addlocal(p, p, "nope")
