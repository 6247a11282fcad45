"""Symbolic-phase tests: block pattern exactness vs scalar counts
(symbolCheck / symbolCost analogs — SURVEY.md §4 point 2)."""

import numpy as np
import pytest

from pastix_tpu import generators as gen
from pastix_tpu.config import PastixConfig
from pastix_tpu.order import (
    compute_ordering,
    etree,
    postorder,
    col_counts,
    fundamental_supernodes,
)
from pastix_tpu.symbolic import (
    compute_symbolic,
    symbolic_factorization,
    supernodal_etree,
)


@pytest.mark.parametrize("gen_fn", [lambda: gen.laplacian_2d(16),
                                    lambda: gen.poisson_3d(6),
                                    lambda: gen.random_spd(120, 0.05)])
def test_fundamental_supernodal_structure_is_exact(gen_fn):
    A = gen_fn()
    o = compute_ordering(A.pattern_sym_scipy())
    Ap = A.permuted(o.permtab).pattern_sym_scipy()
    parent = etree(Ap)
    cc = col_counts(Ap, parent, postorder(parent))
    rangtab = fundamental_supernodes(parent, cc)
    sym = symbolic_factorization(Ap, rangtab)
    sym.check()
    assert sym.nnz_l() == cc.sum()


def test_amalgamation_superset_and_bounded():
    A = gen.laplacian_2d(24)
    cfg = PastixConfig(amalgamation_level=15)
    o = compute_ordering(A.pattern_sym_scipy(), cfg)
    Ap = A.permuted(o.permtab).pattern_sym_scipy()
    sym, info = compute_symbolic(Ap, o, cfg)
    sym.check()
    assert sym.nnz_l() >= info["nnz_l_exact"]
    assert sym.nnz_l() <= 1.6 * info["nnz_l_exact"]
    assert sym.cblknbr <= A.n


def test_supernodal_etree_valid():
    A = gen.laplacian_2d(12)
    o = compute_ordering(A.pattern_sym_scipy())
    Ap = A.permuted(o.permtab).pattern_sym_scipy()
    sym, _ = compute_symbolic(Ap, o)
    par = supernodal_etree(sym)
    assert np.all(par[par >= 0] > np.arange(sym.cblknbr)[par >= 0])


def test_symbol_save_load(tmp_path):
    A = gen.laplacian_2d(10)
    o = compute_ordering(A.pattern_sym_scipy())
    Ap = A.permuted(o.permtab).pattern_sym_scipy()
    sym, _ = compute_symbolic(Ap, o)
    p = str(tmp_path / "symb")
    sym.save(p)
    from pastix_tpu.symbolic import SymbolMatrix

    s2 = SymbolMatrix.load(p)
    assert s2.nnz_l() == sym.nnz_l()
    assert np.array_equal(s2.rangtab, sym.rangtab)


def test_cost_model_flops_positive():
    A = gen.poisson_3d(5)
    o = compute_ordering(A.pattern_sym_scipy())
    Ap = A.permuted(o.permtab).pattern_sym_scipy()
    sym, info = compute_symbolic(Ap, o)
    assert sym.fact_flops() > 0
    assert sym.fact_flops("lu") == 2 * sym.fact_flops("llt")
    assert info["flops_exact"] > 0
