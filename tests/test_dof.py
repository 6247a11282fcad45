"""Multi-dof input (IPARM_DOF_NBR analog): ordering on the node graph.

Reference: PaStiX 5.2 accepts node-compressed input with ``d`` degrees of
freedom per graph node (api.h IPARM_DOF_NBR); rows {i*d .. i*d+d-1} belong
to node i and the fill-reducing ordering runs on the node graph.
"""

import numpy as np
import pytest
import scipy.sparse as sp

import pastix_tpu
from pastix_tpu import Pastix, PastixConfig
from pastix_tpu.config import Factorization
from pastix_tpu.generators import elasticity_3d, poisson_3d


def _expand_dof(A_nodes, d, seed=0):
    """Expand a node matrix to d dofs per node with SPD d x d blocks."""
    rng = np.random.default_rng(seed)
    C = sp.coo_matrix(A_nodes)
    # build from the lower triangle only; random dense dxd coupling on the
    # kept (i >= j) entries, mirrored when symmetrizing below
    keep = C.row >= C.col
    rows, cols, vals = [], [], []
    for k in np.flatnonzero(keep):
        i, j, v = int(C.row[k]), int(C.col[k]), C.data[k]
        B = v * np.eye(d) + 0.1 * rng.standard_normal((d, d))
        if i == j:
            B = (B + B.T) / 2 + d * np.eye(d)
        for a in range(d):
            for b in range(d):
                rows.append(i * d + a)
                cols.append(j * d + b)
                vals.append(B[a, b])
                if i != j:
                    rows.append(j * d + b)
                    cols.append(i * d + a)
                    vals.append(B[a, b])
    n = A_nodes.shape[0] * d
    M = sp.coo_matrix((vals, (rows, cols)), shape=(n, n)).tocsc()
    # diagonal dominance -> SPD
    M = M + sp.eye(n) * (abs(M).sum(axis=1).max())
    return sp.csc_matrix(M)


def test_dof_ordering_expansion():
    """Node-graph ordering expands to a valid dof permutation with each
    node's dofs adjacent."""
    d = 3
    A_nodes = poisson_3d(6).to_scipy()
    A = _expand_dof(A_nodes, d)
    solver = Pastix(A, PastixConfig(dof_nbr=d))
    order = solver.order()
    order.check()
    # every node's dofs are consecutive in the new ordering
    nodes = order.peritab // d
    assert np.all(nodes.reshape(-1, d) == nodes.reshape(-1, d)[:, :1])
    # supernode ranges are node-aligned
    assert np.all(order.rangtab % d == 0)


def test_dof_solve_matches_scipy():
    d = 2
    A_nodes = poisson_3d(5).to_scipy()
    A = _expand_dof(A_nodes, d)
    b = A @ np.ones(A.shape[0])
    x = pastix_tpu.spsolve(A, b, dof_nbr=d)
    res = np.linalg.norm(b - A @ x) / np.linalg.norm(b)
    assert res < 1e-9
    assert np.allclose(x, 1.0, atol=1e-6)


def test_dof_bsr_input():
    """scipy BSR input with blocksize (d, d) is accepted directly."""
    d = 2
    A_nodes = poisson_3d(4).to_scipy()
    A = _expand_dof(A_nodes, d)
    A_bsr = sp.bsr_matrix(A, blocksize=(d, d))
    b = A @ np.arange(1.0, A.shape[0] + 1.0)
    x = pastix_tpu.spsolve(A_bsr, b, dof_nbr=d)
    res = np.linalg.norm(b - A @ x) / np.linalg.norm(b)
    assert res < 1e-9


def test_dof_elasticity_native_blocks():
    """3D elasticity (d=3 vector problem) through the dof path, LDLT."""
    A = elasticity_3d(4).to_scipy()
    assert A.shape[0] % 3 == 0
    b = A @ np.ones(A.shape[0])
    x = pastix_tpu.spsolve(
        A, b, dof_nbr=3, factorization=Factorization.LDLT
    )
    res = np.linalg.norm(b - A @ x) / np.linalg.norm(b)
    assert res < 1e-9


def test_dof_size_mismatch_raises():
    A = poisson_3d(4).to_scipy()  # n = 64, not a multiple of 3
    solver = Pastix(A, PastixConfig(dof_nbr=3))
    with pytest.raises(ValueError, match="multiple of dof_nbr"):
        solver.order()


def test_dof_from_iparm():
    cfg = PastixConfig.from_iparm({"IPARM_DOF_NBR": 3})
    assert cfg.dof_nbr == 3


def test_murge_dof_option():
    """MURGE_IPARAM_DOF analog: dof flows through the Murge option verb."""
    from pastix_tpu.murge import MurgeSolver

    d = 2
    A_nodes = poisson_3d(4).to_scipy()
    A = _expand_dof(A_nodes, d)
    C = sp.coo_matrix(A)
    m = MurgeSolver(A.shape[0])
    m.set_option("IPARM_DOF_NBR", d)
    m.graph_begin()
    m.graph_edge(C.row, C.col)
    m.graph_end()
    m.assembly_begin()
    m.assembly_set_value(C.row, C.col, C.data)
    m.assembly_end()
    b = A @ np.ones(A.shape[0])
    x = m.solve(b)
    assert np.linalg.norm(b - A @ x) / np.linalg.norm(b) < 1e-9
    assert m.config.dof_nbr == d
