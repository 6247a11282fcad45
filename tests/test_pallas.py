"""Fused Pallas gather-GEMM-scatter kernel vs the XLA baseline.

Runs in interpreter mode on CPU (the kernels themselves target TPU; the
interpreter checks the logic — DMA schedule, first/last accumulation,
aliasing — exactly).  Tolerances are bf16x3-split grade: the fused kernel
computes fp32 products as three bf16 MXU passes (~1e-4 absolute on O(1)
data); iterative refinement closes the gap to fp64 downstream."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pastix_tpu.numeric.pallas_kernels as PK
from pastix_tpu.numeric import kernels as K
from pastix_tpu.numeric.pallas_kernels import gemm_scatter_fused, sort_triples


@pytest.fixture(autouse=True)
def _interpret():
    old = PK._INTERPRET
    PK._INTERPRET = True
    yield
    PK._INTERPRET = old


def _triples(rng, ng, nsrc, npool):
    ga = rng.integers(0, nsrc, ng).astype(np.int32)
    gb = rng.integers(0, nsrc, ng).astype(np.int32)
    gd = rng.integers(nsrc, npool, ng).astype(np.int32)
    return ga, gb, gd


def test_fused_matches_xla_plain(rng):
    npool, T, ng = 40, 16, 33
    pool = rng.standard_normal((npool, T, T)).astype(np.float32)
    ga, gb, gd = _triples(rng, ng, 20, npool)
    ref = K.gemm_scatter(
        jnp.asarray(pool), jnp.asarray(ga), jnp.asarray(gb), jnp.asarray(gd)
    )
    out = gemm_scatter_fused(jnp.asarray(pool), *sort_triples(ga, gb, gd))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-3, atol=1e-3)


def test_fused_matches_xla_scaled(rng):
    npool, T, ng, nbc = 30, 8, 20, 6
    pool = rng.standard_normal((npool, T, T)).astype(np.float32)
    ga, gb, gd = _triples(rng, ng, 15, npool)
    d = (rng.standard_normal((nbc, T)) + 3).astype(np.float32)
    gk = rng.integers(0, nbc, ng).astype(np.int32)
    ref = K.gemm_scatter(
        jnp.asarray(pool), jnp.asarray(ga), jnp.asarray(gb), jnp.asarray(gd),
        scale_cols=jnp.asarray(d)[gk],
    )
    sga, sgb, sgd, first, last, sgk = sort_triples(ga, gb, gd, gk)
    out = gemm_scatter_fused(
        jnp.asarray(pool), sga, sgb, sgd, first, last, gk=sgk, d=jnp.asarray(d)
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-3, atol=1e-3)


def test_fused_matches_xla_cross_pool(rng):
    npool, T, ng = 30, 8, 20
    pool = rng.standard_normal((npool, T, T)).astype(np.float32)
    pool_u = rng.standard_normal((npool, T, T)).astype(np.float32)
    ga, gb, gd = _triples(rng, ng, 15, npool)
    ref = K.gemm_scatter_ab(
        jnp.asarray(pool), jnp.asarray(pool), jnp.asarray(pool_u),
        jnp.asarray(ga), jnp.asarray(gb), jnp.asarray(gd),
    )
    out = gemm_scatter_fused(
        jnp.asarray(pool), *sort_triples(ga, gb, gd),
        src_pool=jnp.asarray(pool_u),
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-3, atol=1e-3)


def test_pipelined_matches_xla_plain(rng):
    from pastix_tpu.numeric.pallas_kernels import (
        build_pipeline_schedule, gemm_scatter_pipelined)

    npool, T, ng = 40, 16, 33
    pool = rng.standard_normal((npool, T, T)).astype(np.float32)
    ga, gb, gd = _triples(rng, ng, 20, npool)
    ref = K.gemm_scatter(
        jnp.asarray(pool), jnp.asarray(ga), jnp.asarray(gb), jnp.asarray(gd)
    )
    for chunk in (7, 4096):  # chunk boundary splits dst segments
        sched = build_pipeline_schedule(ga, gb, gd, chunk=chunk)
        out = gemm_scatter_pipelined(jnp.asarray(pool), sched)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=1e-3, atol=1e-3
        )


def test_pipelined_matches_xla_scaled(rng):
    from pastix_tpu.numeric.pallas_kernels import (
        build_pipeline_schedule, gemm_scatter_pipelined)

    npool, T, ng, nbc = 30, 8, 20, 6
    pool = rng.standard_normal((npool, T, T)).astype(np.float32)
    ga, gb, gd = _triples(rng, ng, 15, npool)
    d = (rng.standard_normal((nbc, T)) + 3).astype(np.float32)
    gk = rng.integers(0, nbc, ng).astype(np.int32)
    ref = K.gemm_scatter(
        jnp.asarray(pool), jnp.asarray(ga), jnp.asarray(gb), jnp.asarray(gd),
        scale_cols=jnp.asarray(d)[gk],
    )
    sched = build_pipeline_schedule(ga, gb, gd, gk=gk, chunk=9)
    out = gemm_scatter_pipelined(jnp.asarray(pool), sched, d=jnp.asarray(d))
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-3, atol=1e-3
    )


@pytest.mark.parametrize("group", [1, 2, 3])
@pytest.mark.parametrize("slots", [2, 3])
def test_pipelined_grouped_padded_tail(rng, group, slots):
    """The production schedule runs group=2 (PASTIX_E2_GROUP): exercise the
    grouped padding/parity/VALID-flag logic with pair counts that force a
    padded tail (gpad > 0) and deeper slab buffering (slots=3)."""
    from pastix_tpu.numeric.pallas_kernels import (
        build_pipeline_schedule, gemm_scatter_pipelined)

    npool, T = 40, 16
    for ng in (7, group * 5 + 1):  # both force gpad for group > 1
        pool = rng.standard_normal((npool, T, T)).astype(np.float32)
        ga, gb, gd = _triples(rng, ng, 20, npool)
        ref = K.gemm_scatter(
            jnp.asarray(pool), jnp.asarray(ga), jnp.asarray(gb),
            jnp.asarray(gd),
        )
        sched = build_pipeline_schedule(ga, gb, gd, group=group)
        out = gemm_scatter_pipelined(jnp.asarray(pool), sched, slots=slots)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=1e-3, atol=1e-3
        )


def test_pipelined_matches_xla_cross_pool(rng):
    from pastix_tpu.numeric.pallas_kernels import (
        build_pipeline_schedule, gemm_scatter_pipelined)

    npool, T, ng = 30, 8, 20
    pool = rng.standard_normal((npool, T, T)).astype(np.float32)
    pool_u = rng.standard_normal((npool, T, T)).astype(np.float32)
    ga, gb, gd = _triples(rng, ng, 15, npool)
    ref = K.gemm_scatter_ab(
        jnp.asarray(pool), jnp.asarray(pool), jnp.asarray(pool_u),
        jnp.asarray(ga), jnp.asarray(gb), jnp.asarray(gd),
    )
    sched = build_pipeline_schedule(ga, gb, gd, chunk=9)
    out = gemm_scatter_pipelined(
        jnp.asarray(pool), sched, src_pool=jnp.asarray(pool_u)
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-3, atol=1e-3
    )


def test_pipelined_rejects_overlapping_src_dst(rng):
    from pastix_tpu.numeric.pallas_kernels import build_pipeline_schedule

    ga = np.array([0, 1], np.int32)
    gb = np.array([2, 3], np.int32)
    gd = np.array([1, 4], np.int32)  # dst 1 is also an a-tile
    with pytest.raises(AssertionError):
        build_pipeline_schedule(ga, gb, gd)


def test_full_factorization_pallas_path(rng):
    """LLT end-to-end with every level routed through the fused kernel."""
    from pastix_tpu.generators import laplacian_2d
    from pastix_tpu.order import compute_ordering
    from pastix_tpu.analyze import build_layout
    from pastix_tpu.numeric.factorize import coefinit, build_factorize_fn
    from pastix_tpu.solve import build_solve_fn, rhs_to_blocks, blocks_to_rhs
    from pastix_tpu.config import PastixConfig, Factorization
    import pastix_tpu.numeric.grouping as G

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


def test_chol_inv_pallas_matches_lax():
    from pastix_tpu.numeric.pallas_kernels import chol_inv_pallas

    rng = np.random.default_rng(0)
    B, T = 5, 128
    A = rng.standard_normal((B, T, T)).astype(np.float32)
    full = A @ np.swapaxes(A, -1, -2) / T + 3 * np.eye(T, dtype=np.float32)
    L, X = chol_inv_pallas(jnp.asarray(full), interpret=True, block=2)
    Lr = np.linalg.cholesky(full)
    assert np.abs(np.asarray(L) - Lr).max() < 1e-5
    assert np.abs(
        np.einsum("bij,bjk->bik", np.asarray(L), np.asarray(X))
        - np.eye(T, dtype=np.float32)
    ).max() < 1e-5


def test_chol_inv_pool_pallas_in_place():
    from pastix_tpu.numeric.pallas_kernels import chol_inv_pool_pallas

    rng = np.random.default_rng(1)
    npool, T = 10, 128
    pool = rng.standard_normal((npool, T, T)).astype(np.float32)
    tiles = [2, 6, 9]
    full = {}
    for i in tiles:
        A = rng.standard_normal((T, T)).astype(np.float32)
        S = A @ A.T / T + 3 * np.eye(T, dtype=np.float32)
        full[i] = S
        # lower-stored with scatter garbage above the diagonal
        pool[i] = np.tril(S) + np.triu(
            rng.standard_normal((T, T)).astype(np.float32), 1
        )
    idx = np.asarray(tiles + [npool + 7], np.int32)  # one pad sentinel
    p2, dinv = chol_inv_pool_pallas(
        jnp.asarray(pool), idx, interpret=True, block=4
    )
    p2, dinv = np.asarray(p2), np.asarray(dinv)
    for k, i in enumerate(tiles):
        Lr = np.linalg.cholesky(full[i])
        assert np.abs(p2[i] - Lr).max() < 1e-5
        assert np.abs(p2[i] @ dinv[k] - np.eye(T)).max() < 1e-5
    # untouched tiles bit-identical (in-place aliasing must not leak)
    for i in [0, 1, 3, 4, 5, 7, 8]:
        np.testing.assert_array_equal(p2[i], pool[i])
