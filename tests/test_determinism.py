"""Determinism: the static schedule makes refactorization bitwise-identical.

The reference's "race discipline" is static scheduling (no work stealing →
deterministic results, SURVEY.md section 5); the JAX analog is functional
purity.  Keep it as a tested invariant — it's also what makes numerical
debugging of the solver tractable."""

import numpy as np

import pastix_tpu
from pastix_tpu.config import Factorization, PastixConfig
from pastix_tpu.generators import laplacian_2d, random_unsym


def test_refactorization_bitwise_identical():
    A = laplacian_2d(16)
    s = pastix_tpu.Pastix(A, PastixConfig())
    f1 = s.factorize()
    p1 = np.asarray(f1.pool).copy()
    f2 = s.factorize()  # same values again
    p2 = np.asarray(f2.pool)
    assert np.array_equal(p1, p2)  # bitwise, not approx


def test_two_instances_identical():
    A = laplacian_2d(12)
    pools = []
    for _ in range(2):
        s = pastix_tpu.Pastix(A, PastixConfig())
        pools.append(np.asarray(s.factorize().pool).copy())
    assert np.array_equal(pools[0], pools[1])


def test_lu_refactorization_bitwise_identical():
    A = random_unsym(120, density=0.06, seed=2)
    cfg = PastixConfig(factorization=Factorization.LU)
    s = pastix_tpu.Pastix(A, cfg)
    f1 = s.factorize()
    p1 = np.asarray(f1.pool).copy()
    u1 = np.asarray(f1.pool_u).copy()
    f2 = s.factorize()
    assert np.array_equal(p1, np.asarray(f2.pool))
    assert np.array_equal(u1, np.asarray(f2.pool_u))


def test_symbol_draw(tmp_path):
    """symbolDraw analog writes a plot (reference symbol_draw.c)."""
    from pastix_tpu.order import compute_ordering
    from pastix_tpu.symbolic.fax import symbolic_factorization

    A = laplacian_2d(8)
    o = compute_ordering(A.pattern_sym_scipy(), PastixConfig())
    sym = symbolic_factorization(
        A.permuted(o.permtab).pattern_sym_scipy(), o.rangtab
    )
    out = tmp_path / "symbol.png"
    sym.draw(str(out))
    assert out.exists() and out.stat().st_size > 0
