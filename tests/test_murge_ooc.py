"""Murge-style incremental assembly + out-of-core factor offload.

Reference anchors: src/murge/ assembly API (SURVEY.md section 2 row 19),
src/sopalin/src/ooc.c (row 15)."""

import numpy as np
import pytest
import scipy.sparse as sp

import pastix_tpu
from pastix_tpu import MurgeSolver
from pastix_tpu.config import PastixConfig
from pastix_tpu.generators import laplacian_2d


def _assemble_laplacian(m, nx):
    """Assemble the 2D 5-point Laplacian edge by edge (FEM-style)."""
    n = nx * nx
    idx = lambda i, j: i * nx + j
    m.graph_begin()
    for i in range(nx):
        for j in range(nx):
            k = idx(i, j)
            m.graph_edge(k, k)
            for di, dj in ((1, 0), (0, 1)):
                if i + di < nx and j + dj < nx:
                    k2 = idx(i + di, j + dj)
                    m.graph_edge(k, k2)
                    m.graph_edge(k2, k)
    m.graph_end()
    m.assembly_begin(MurgeSolver.ADD)
    for i in range(nx):
        for j in range(nx):
            k = idx(i, j)
            m.assembly_set_value(k, k, 4.0)
            for di, dj in ((1, 0), (0, 1)):
                if i + di < nx and j + dj < nx:
                    k2 = idx(i + di, j + dj)
                    m.assembly_set_value(k, k2, -1.0)
                    m.assembly_set_value(k2, k, -1.0)
    m.assembly_end()


def test_murge_assembly_matches_generator():
    nx = 8
    m = MurgeSolver(nx * nx)
    _assemble_laplacian(m, nx)
    ref = laplacian_2d(nx).to_scipy()
    d = (m.matrix.to_scipy() - ref).tocoo()
    assert d.nnz == 0 or abs(d.data).max() < 1e-14


def test_murge_solve_and_value_reuse():
    nx = 8
    n = nx * nx
    m = MurgeSolver(n)
    _assemble_laplacian(m, nx)
    A = m.matrix.to_scipy()
    b = A @ np.ones(n)
    x = m.solve(b)
    assert np.abs(x - 1).max() < 1e-8

    # second assembly, same pattern, scaled values -> cached analysis
    m.assembly_begin(MurgeSolver.OVERWRITE)
    C = sp.coo_matrix(sp.csc_matrix(A) * 3.0)
    m.assembly_set_value(C.row, C.col, C.data)
    m.assembly_end()
    x2 = m.solve(3.0 * b)
    assert np.abs(x2 - 1).max() < 1e-8


def test_murge_rejects_out_of_graph_entry():
    m = MurgeSolver(10)
    m.graph_begin()
    m.graph_edge(0, 1)
    m.graph_end()
    m.assembly_begin()
    with pytest.raises(ValueError, match="not in the graph"):
        m.assembly_set_value(5, 7, 1.0)


def test_ooc_offload_roundtrip():
    A = laplacian_2d(12)
    b = A.to_scipy() @ np.ones(A.n)
    s = pastix_tpu.Pastix(A, PastixConfig(ooc=True))
    s.factorize()
    assert isinstance(s.factors.pool, np.ndarray)  # lives on host
    x = s.solve(b)
    assert np.abs(x - 1).max() < 1e-8


def test_ooc_limit_keeps_small_factors_resident():
    A = laplacian_2d(8)
    s = pastix_tpu.Pastix(A, PastixConfig(ooc=True, ooc_limit_mb=512))
    s.factorize()
    assert not isinstance(s.factors.pool, np.ndarray)  # fits: stays on device
    b = A.to_scipy() @ np.ones(A.n)
    x = s.solve(b)
    assert np.abs(x - 1).max() < 1e-8


def test_murge_options_rhs_info():
    """MURGE_SetOption / SetGlobalRHS / GetGlobalSolution / GetInfo verbs."""
    import scipy.sparse as sp
    from pastix_tpu.generators import laplacian_2d

    A = laplacian_2d(10).to_scipy().tocoo()
    n = A.shape[0]
    m = MurgeSolver(n)
    m.set_option("IPARM_FACTORIZATION", "API_FACT_LDLT")
    m.set_option("refinement_eps", 1e-11)
    assert m.config.factorization.value == "ldlt"
    assert m.config.refinement_eps == 1e-11
    m.graph_begin(); m.graph_edge(A.row, A.col); m.graph_end()
    m.assembly_begin(); m.assembly_set_value(A.row, A.col, A.data); m.assembly_end()
    b = A.tocsc() @ np.ones(n)
    m.set_global_rhs(b)
    x = m.get_global_solution()
    assert np.abs(x - 1).max() < 1e-9
    assert m.get_info("IPARM_NNZEROS") > 0
    assert m.get_info("DPARM_FACT_TIME") > 0
    m.clean()
    assert m.report is None


def test_murge_set_option_back_to_default():
    """Regression: resetting a slot to its field default must take effect
    (the old defaults-diff overlay silently dropped such writes)."""
    m = MurgeSolver(4)
    default_itermax = PastixConfig().refinement_itermax
    m.set_option("IPARM_ITERMAX", 7)
    assert m.config.refinement_itermax == 7
    m.set_option("IPARM_ITERMAX", default_itermax)
    assert m.config.refinement_itermax == default_itermax
    # and the write-back must not clobber unrelated non-default fields
    m.set_option("IPARM_FACTORIZATION", "API_FACT_LDLT")
    m.set_option("IPARM_ITERMAX", 9)
    assert m.config.factorization.value == "ldlt"
    assert m.config.refinement_itermax == 9
