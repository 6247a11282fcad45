"""Dst-block E2 kernel vs the XLA baseline (interpret mode, real tables)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pastix_tpu.numeric.block_kernels as BK
from pastix_tpu.numeric import kernels as K
from pastix_tpu.numeric.block_kernels import build_block_plan, gemm_scatter_block


@pytest.fixture(autouse=True)
def _interpret():
    old = BK._INTERPRET
    BK._INTERPRET = True
    yield
    BK._INTERPRET = old


@pytest.fixture(scope="module")
def small_problem():
    from pastix_tpu.generators import poisson_3d
    from pastix_tpu.pastix import Pastix
    from pastix_tpu.config import PastixConfig

    A = poisson_3d(7)
    s = Pastix(A, PastixConfig(tile_size=16, dense_tail=False))
    s.order()
    s.symbfact()
    s.analyze()
    return s.layout


def _run_level(lay, lv, pool, d=None, chunk=2048, gate=100.0):
    plan = build_block_plan(
        lv.gemm_a, lv.gemm_b, lv.gemm_d, lv.gemm_k,
        lay.blk_row, lay.blk_col, lay.keys, lay.nbc, lay.npool,
        chunk=chunk, gate=gate,
    )
    out = gemm_scatter_block(jnp.asarray(pool), plan, d=d)
    fga, fgb, fgd, fgk = plan.fallback
    if fga.size:
        sc = d[jnp.asarray(fgk)] if d is not None else None
        out = K.gemm_scatter(
            out, jnp.asarray(fga.astype(np.int32)),
            jnp.asarray(fgb.astype(np.int32)),
            jnp.asarray(fgd.astype(np.int32)), scale_cols=sc,
        )
    return np.asarray(out), plan


def _levels_with_pairs(lay, k=3):
    lvs = [lv for lv in lay.levels if lv.gemm_a.size > 4]
    lvs.sort(key=lambda lv: -lv.gemm_a.size)
    return [lvs[0], lvs[len(lvs) // 2], lvs[-1]][:k]


def test_block_matches_xla_plain(small_problem, rng):
    lay = small_problem
    pool = rng.standard_normal((lay.npool, lay.T, lay.T)).astype(np.float32)
    for lv in _levels_with_pairs(lay):
        ref = K.gemm_scatter(
            jnp.asarray(pool), jnp.asarray(lv.gemm_a),
            jnp.asarray(lv.gemm_b), jnp.asarray(lv.gemm_d),
        )
        out, plan = _run_level(lay, lv, pool)
        assert plan.n_block_pairs > 0
        np.testing.assert_allclose(out, np.asarray(ref), rtol=1e-3, atol=1e-3)


def test_block_matches_xla_chunked(small_problem, rng):
    lay = small_problem
    pool = rng.standard_normal((lay.npool, lay.T, lay.T)).astype(np.float32)
    lv = _levels_with_pairs(lay, 1)[0]
    ref = K.gemm_scatter(
        jnp.asarray(pool), jnp.asarray(lv.gemm_a),
        jnp.asarray(lv.gemm_b), jnp.asarray(lv.gemm_d),
    )
    for chunk in (3, 17):
        out, _ = _run_level(lay, lv, pool, chunk=chunk)
        np.testing.assert_allclose(out, np.asarray(ref), rtol=1e-3, atol=1e-3)


def test_block_matches_xla_scaled(small_problem, rng):
    lay = small_problem
    pool = rng.standard_normal((lay.npool, lay.T, lay.T)).astype(np.float32)
    d = (rng.standard_normal((lay.nbc, lay.T)) + 3).astype(np.float32)
    for lv in _levels_with_pairs(lay, 2):
        ref = K.gemm_scatter(
            jnp.asarray(pool), jnp.asarray(lv.gemm_a),
            jnp.asarray(lv.gemm_b), jnp.asarray(lv.gemm_d),
            scale_cols=jnp.asarray(d)[lv.gemm_k],
        )
        out, _ = _run_level(lay, lv, pool, d=jnp.asarray(d))
        np.testing.assert_allclose(out, np.asarray(ref), rtol=1e-3, atol=1e-3)


def test_block_gate_fallback(small_problem, rng):
    """gate=0 sends everything to the fallback, result unchanged."""
    lay = small_problem
    pool = rng.standard_normal((lay.npool, lay.T, lay.T)).astype(np.float32)
    lv = _levels_with_pairs(lay, 1)[0]
    ref = K.gemm_scatter(
        jnp.asarray(pool), jnp.asarray(lv.gemm_a),
        jnp.asarray(lv.gemm_b), jnp.asarray(lv.gemm_d),
    )
    out, plan = _run_level(lay, lv, pool, gate=0.0)
    assert plan.n_block_pairs == 0
    np.testing.assert_allclose(out, np.asarray(ref), rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("kind_name", ["llt", "ldlt"])
def test_full_factorization_block_path(monkeypatch, kind_name):
    """End-to-end through the dst-block E2 path (all levels unrolled)."""
    import pastix_tpu.numeric.pallas_kernels as PK
    from pastix_tpu.generators import laplacian_2d
    from pastix_tpu.order import compute_ordering
    from pastix_tpu.analyze import build_layout
    from pastix_tpu.numeric.factorize import coefinit, build_factorize_fn
    from pastix_tpu.solve import build_solve_fn, rhs_to_blocks, blocks_to_rhs
    from pastix_tpu.config import PastixConfig, Factorization
    import pastix_tpu.numeric.grouping as G

    monkeypatch.setenv("PASTIX_E2_BLOCK", "1")
    monkeypatch.setenv("PASTIX_BLOCK_GATE", "100")  # force blocks everywhere
    monkeypatch.setattr(PK, "_INTERPRET", True)

    A = laplacian_2d(10)
    o = compute_ordering(A.pattern_sym_scipy(), PastixConfig())
    Ap = A.permuted(o.permtab)
    layout = build_layout(Ap.pattern_sym_scipy(), 8)
    pool0, _ = coefinit(layout, Ap.to_scipy(), dtype=np.float32)

    orig = G.group_levels
    G.group_levels = lambda levels, npool, nbc, **kw: [
        ("unroll", lv) for lv in levels
    ]
    kind = Factorization.LLT if kind_name == "llt" else Factorization.LDLT
    try:
        fact = build_factorize_fn(layout, kind, use_pallas=True)
    finally:
        G.group_levels = orig
    solv = build_solve_fn(layout, kind)
    b = Ap.to_scipy() @ np.ones(A.n)
    bb = jnp.asarray(rhs_to_blocks(layout, b, dtype=np.float32))
    if kind == Factorization.LLT:
        x = solv(fact(jnp.asarray(pool0)), bb)
    else:
        pool, d, npiv = fact(jnp.asarray(pool0), jnp.float32(1e-12))
        x = solv(pool, d, bb)
    xs = blocks_to_rhs(layout, np.asarray(x))
    assert np.abs(xs - 1).max() < 1e-4
