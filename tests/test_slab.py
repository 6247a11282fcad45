"""Panel-slab E2 kernel vs the XLA baseline, and row-bound correctness.

Interpreter mode on CPU (like test_pallas.py): checks the slab schedule's
window/slab DMA state machine, offsets, row-bounded sub-matmuls and
chunk-boundary handling against K.gemm_scatter on REAL level tables from
a small 3D Poisson analysis."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pastix_tpu.numeric.slab_kernels as SK
from pastix_tpu.numeric import kernels as K
from pastix_tpu.numeric.slab_kernels import build_slab_plan, gemm_scatter_slab


@pytest.fixture(autouse=True)
def _interpret():
    old = SK._INTERPRET
    SK._INTERPRET = True
    yield
    SK._INTERPRET = old


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
    lay = s.layout
    diag_of_col = np.asarray(
        lay.lookup(np.arange(lay.nbc), np.arange(lay.nbc))
    )
    return lay, diag_of_col, s._pat_perm_ext


def _rbounds_for_layout(lay, pat):
    from pastix_tpu.analyze.blocksym import tile_row_bounds

    keys, rlo, rhi, nbc = tile_row_bounds(pat, lay.T)
    pos = np.searchsorted(keys, lay.keys)
    out_lo = np.zeros(lay.npool, np.int32)
    out_hi = np.full(lay.npool, lay.T - 1, np.int32)
    hit = (pos < keys.size) & (keys[np.minimum(pos, keys.size - 1)] == lay.keys)
    out_lo[hit] = rlo[pos[hit]]
    out_hi[hit] = rhi[pos[hit]]
    return out_lo, out_hi


def _run_level(lay, diag_of_col, lv, pool, rbounds=None, d=None,
               chunk=4096, C=4, H=8, G=2, min_panel=2):
    plan = build_slab_plan(
        lv.gemm_a, lv.gemm_b, lv.gemm_d, lv.gemm_k, diag_of_col,
        lay.npool, C=C, H=H, G=G, chunk=chunk, min_panel=min_panel,
        rbounds=rbounds, T=lay.T,
    )
    out = gemm_scatter_slab(jnp.asarray(pool), plan, d=d)
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
    # widest, a mid one, and the last
    lvs.sort(key=lambda lv: -lv.gemm_a.size)
    return [lvs[0], lvs[len(lvs) // 2], lvs[-1]][:k]


def test_slab_matches_xla_plain(small_problem, rng):
    lay, diag_of_col, _ = small_problem
    pool = rng.standard_normal((lay.npool, lay.T, lay.T)).astype(np.float32)
    for lv in _levels_with_pairs(lay):
        ref = K.gemm_scatter(
            jnp.asarray(pool), jnp.asarray(lv.gemm_a),
            jnp.asarray(lv.gemm_b), jnp.asarray(lv.gemm_d),
        )
        out, plan = _run_level(lay, diag_of_col, lv, pool)
        assert plan.n_slab_pairs > 0
        np.testing.assert_allclose(out, np.asarray(ref), rtol=1e-3, atol=1e-3)


def test_slab_matches_xla_chunked_and_grouped(small_problem, rng):
    lay, diag_of_col, _ = small_problem
    pool = rng.standard_normal((lay.npool, lay.T, lay.T)).astype(np.float32)
    lv = _levels_with_pairs(lay, 1)[0]
    ref = K.gemm_scatter(
        jnp.asarray(pool), jnp.asarray(lv.gemm_a),
        jnp.asarray(lv.gemm_b), jnp.asarray(lv.gemm_d),
    )
    for chunk, G in [(7, 1), (13, 3), (4096, 4)]:
        out, _ = _run_level(
            lay, diag_of_col, lv, pool, chunk=chunk, G=G
        )
        np.testing.assert_allclose(out, np.asarray(ref), rtol=1e-3, atol=1e-3)


def test_slab_matches_xla_row_bounded(small_problem, rng):
    lay, diag_of_col, pat = small_problem
    rb = _rbounds_for_layout(lay, pat)
    # zero the pool rows OUTSIDE the declared bounds: a real factorization
    # pool is structurally zero there, which is what makes bounding valid
    pool = rng.standard_normal((lay.npool, lay.T, lay.T)).astype(np.float32)
    rows = np.arange(lay.T)[None, :]
    mask = (rows >= rb[0][:, None]) & (rows <= rb[1][:, None])
    pool *= mask[:, :, None]
    for lv in _levels_with_pairs(lay):
        ref = K.gemm_scatter(
            jnp.asarray(pool), jnp.asarray(lv.gemm_a),
            jnp.asarray(lv.gemm_b), jnp.asarray(lv.gemm_d),
        )
        out, plan = _run_level(lay, diag_of_col, lv, pool, rbounds=rb)
        assert plan.stats["flop_frac"] <= 1.0
        np.testing.assert_allclose(out, np.asarray(ref), rtol=1e-3, atol=1e-3)


def test_slab_matches_xla_scaled(small_problem, rng):
    lay, diag_of_col, _ = small_problem
    pool = rng.standard_normal((lay.npool, lay.T, lay.T)).astype(np.float32)
    d = (rng.standard_normal((lay.nbc, lay.T)) + 3).astype(np.float32)
    for lv in _levels_with_pairs(lay, 2):
        ref = K.gemm_scatter(
            jnp.asarray(pool), jnp.asarray(lv.gemm_a),
            jnp.asarray(lv.gemm_b), jnp.asarray(lv.gemm_d),
            scale_cols=jnp.asarray(d)[lv.gemm_k],
        )
        out, _ = _run_level(
            lay, diag_of_col, lv, pool, d=jnp.asarray(d)
        )
        np.testing.assert_allclose(out, np.asarray(ref), rtol=1e-3, atol=1e-3)


def test_slab_bf16_update(small_problem, rng):
    lay, diag_of_col, _ = small_problem
    pool = rng.standard_normal((lay.npool, lay.T, lay.T)).astype(np.float32)
    lv = _levels_with_pairs(lay, 1)[0]
    ref = K.gemm_scatter(
        jnp.asarray(pool), jnp.asarray(lv.gemm_a), jnp.asarray(lv.gemm_b),
        jnp.asarray(lv.gemm_d), update_dtype=jnp.bfloat16,
    )
    plan = build_slab_plan(
        lv.gemm_a, lv.gemm_b, lv.gemm_d, lv.gemm_k, diag_of_col,
        lay.npool, C=4, H=8, G=2, min_panel=2, T=lay.T,
    )
    out = gemm_scatter_slab(
        jnp.asarray(pool), plan, update_dtype=jnp.bfloat16
    )
    fga, fgb, fgd, _ = plan.fallback
    if fga.size:
        out = K.gemm_scatter(
            out, jnp.asarray(fga.astype(np.int32)),
            jnp.asarray(fgb.astype(np.int32)),
            jnp.asarray(fgd.astype(np.int32)), update_dtype=jnp.bfloat16,
        )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=3e-2, atol=3e-2
    )


def test_tile_row_bounds_cover_scalar_supports(small_problem):
    """tile_row_bounds must be a superset of the exact per-tile scalar
    support (cross-checked against the independent scalar_supports
    implementation)."""
    from pastix_tpu.analyze.blocksym import tile_row_bounds
    from pastix_tpu.analyze.packed import scalar_supports

    lay, _, pat = small_problem
    T, nbc = lay.T, lay.nbc
    keys, rlo, rhi, _ = tile_row_bounds(pat, T)
    supports = scalar_supports(pat, T, nbc)
    for J in range(nbc):
        supp = supports[J]
        if not supp.size:
            continue
        tiles = supp // T
        for I in np.unique(tiles):
            rows = supp[tiles == I] - I * T
            key = np.int64(J) * nbc + I
            pos = np.searchsorted(keys, key)
            assert keys[pos] == key, "support tile missing from bounds"
            assert rlo[pos] <= rows.min() and rhi[pos] >= rows.max()
    # diagonal tiles are full
    dk = np.arange(nbc, dtype=np.int64) * nbc + np.arange(nbc)
    pos = np.searchsorted(keys, dk)
    assert (keys[pos] == dk).all()
    assert (rlo[pos] == 0).all() and (rhi[pos] == T - 1).all()


@pytest.mark.parametrize("cfg", [(4, 8, 2, 2), (8, 16, 3, 4)])
def test_full_llt_with_slab_kernel(monkeypatch, cfg):
    """End-to-end LL^T through the slab E2 path (all levels unrolled)."""
    import pastix_tpu.numeric.pallas_kernels as PK
    from pastix_tpu.generators import laplacian_2d
    from pastix_tpu.order import compute_ordering
    from pastix_tpu.analyze import build_layout
    from pastix_tpu.numeric.factorize import coefinit, build_factorize_fn
    from pastix_tpu.solve import build_solve_fn, rhs_to_blocks, blocks_to_rhs
    from pastix_tpu.config import PastixConfig, Factorization
    import pastix_tpu.numeric.grouping as G

    C, H, g, mp = cfg
    monkeypatch.setenv("PASTIX_SLAB_C", str(C))
    monkeypatch.setenv("PASTIX_SLAB_H", str(H))
    monkeypatch.setenv("PASTIX_SLAB_G", str(g))
    monkeypatch.setenv("PASTIX_SLAB_MINPANEL", str(mp))
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
    try:
        fact = build_factorize_fn(layout, Factorization.LLT, use_pallas=True)
    finally:
        G.group_levels = orig
    solv = build_solve_fn(layout, Factorization.LLT)
    b = Ap.to_scipy() @ np.ones(A.n)
    bb = jnp.asarray(rhs_to_blocks(layout, b, dtype=np.float32))
    x = solv(fact(jnp.asarray(pool0)), bb)
    xs = blocks_to_rhs(layout, np.asarray(x))
    assert np.abs(xs - 1).max() < 1e-4


def test_full_ldlt_with_slab_kernel(monkeypatch):
    import pastix_tpu.numeric.pallas_kernels as PK
    from pastix_tpu.generators import laplacian_2d
    from pastix_tpu.order import compute_ordering
    from pastix_tpu.analyze import build_layout
    from pastix_tpu.numeric.factorize import coefinit, build_factorize_fn
    from pastix_tpu.solve import build_solve_fn, rhs_to_blocks, blocks_to_rhs
    from pastix_tpu.config import PastixConfig, Factorization
    import pastix_tpu.numeric.grouping as G

    monkeypatch.setenv("PASTIX_SLAB_C", "4")
    monkeypatch.setenv("PASTIX_SLAB_H", "8")
    monkeypatch.setenv("PASTIX_SLAB_G", "2")
    monkeypatch.setenv("PASTIX_SLAB_MINPANEL", "2")
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
    try:
        fact = build_factorize_fn(layout, Factorization.LDLT, use_pallas=True)
    finally:
        G.group_levels = orig
    solv = build_solve_fn(layout, Factorization.LDLT)
    pool, d, npiv = fact(jnp.asarray(pool0), jnp.float32(1e-12))
    b = Ap.to_scipy() @ np.ones(A.n)
    bb = jnp.asarray(rhs_to_blocks(layout, b, dtype=np.float32))
    x = solv(pool, d, bb)
    xs = blocks_to_rhs(layout, np.asarray(x))
    assert np.abs(xs - 1).max() < 1e-4


@pytest.mark.parametrize("kind_name", ["llt", "ldlt"])
def test_full_factorization_stream_path(monkeypatch, kind_name):
    """End-to-end through the bf16 panel-stream E2 path."""
    import pastix_tpu.numeric.pallas_kernels as PK
    from pastix_tpu.generators import laplacian_2d
    from pastix_tpu.order import compute_ordering
    from pastix_tpu.analyze import build_layout
    from pastix_tpu.numeric.factorize import coefinit, build_factorize_fn
    from pastix_tpu.solve import build_solve_fn, rhs_to_blocks, blocks_to_rhs
    from pastix_tpu.config import PastixConfig, Factorization
    import pastix_tpu.numeric.grouping as G

    monkeypatch.setenv("PASTIX_E2_STREAM", "1")
    monkeypatch.setattr(PK, "_INTERPRET", True)
    import importlib

    F = importlib.import_module("pastix_tpu.numeric.factorize")
    monkeypatch.setattr(F, "_PANEL_CHUNK", 7)  # force the chunked scan
    if True:
        A = laplacian_2d(10)
        o = compute_ordering(A.pattern_sym_scipy(), PastixConfig())
        Ap = A.permuted(o.permtab)
        layout = build_layout(Ap.pattern_sym_scipy(), 8)
        pool0, _ = F.coefinit(layout, Ap.to_scipy(), dtype=np.float32)

        orig = G.group_levels
        G.group_levels = lambda levels, npool, nbc, **kw: [
            ("unroll", lv) for lv in levels
        ]
        kind = (
            Factorization.LLT if kind_name == "llt" else Factorization.LDLT
        )
        try:
            fact = F.build_factorize_fn(
                layout, kind, use_pallas=True,
                update_dtype=jnp.bfloat16,
            )
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
        # bf16 updates: refinement-grade accuracy, not fp32-exact
        assert np.abs(xs - 1).max() < 5e-2


def test_full_lu_stream_path(monkeypatch):
    """LU end-to-end through the dual bf16 panel streams (L and U)."""
    import pastix_tpu.numeric.pallas_kernels as PK
    from pastix_tpu.generators import random_unsym
    from pastix_tpu.order import compute_ordering
    from pastix_tpu.analyze import build_layout
    from pastix_tpu.solve import build_solve_fn, rhs_to_blocks, blocks_to_rhs
    from pastix_tpu.config import PastixConfig, Factorization
    import pastix_tpu.numeric.grouping as G
    import importlib

    F = importlib.import_module("pastix_tpu.numeric.factorize")
    monkeypatch.setenv("PASTIX_E2_STREAM", "1")
    monkeypatch.setattr(F, "_PANEL_CHUNK", 7)
    monkeypatch.setattr(PK, "_INTERPRET", True)
    import pastix_tpu.numeric.leftlook as LLmod

    monkeypatch.setattr(LLmod, "_INTERPRET", True)

    A = random_unsym(220, density=0.03, seed=5)
    o = compute_ordering(A.pattern_sym_scipy(), PastixConfig())
    Ap = A.permuted(o.permtab)
    layout = build_layout(Ap.pattern_sym_scipy(), 8, for_lu=True)
    pool0, pool_u0 = F.coefinit(
        layout, Ap.to_scipy(), dtype=np.float32, for_lu=True
    )
    orig = G.group_levels
    G.group_levels = lambda levels, npool, nbc, **kw: [
        ("unroll", lv) for lv in levels
    ]
    try:
        fact = F.build_factorize_fn(
            layout, Factorization.LU, use_pallas=True,
            update_dtype=jnp.bfloat16,
        )
    finally:
        G.group_levels = orig
    pool, pool_u, npiv = fact(
        jnp.asarray(pool0), jnp.asarray(pool_u0), jnp.float32(1e-10)
    )
    solv = build_solve_fn(layout, Factorization.LU)
    b = Ap.to_scipy() @ np.ones(A.n)
    bb = jnp.asarray(rhs_to_blocks(layout, b, dtype=np.float32))
    x = solv(pool, pool_u, bb)
    xs = blocks_to_rhs(layout, np.asarray(x))
    assert np.abs(xs - 1).max() < 5e-2  # bf16-update grade
