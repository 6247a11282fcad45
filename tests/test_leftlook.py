"""Left-looking E2 path vs the XLA right-looking reference (interpret
mode on CPU).  Covers: regroup_left classification totals, the LL kernel
(both cache modes) against kernels.gemm_scatter on real level tables,
and full factorizations (LLT incl. dense-tail pre-pass, LDLT, LU).

Reference: the E2 task family of sopalin_smp
(src/sopalin/src/sopalin3d.c) — SURVEY.md section 2 row 9.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import pastix_tpu.numeric.leftlook as LL
import pastix_tpu.numeric.pallas_kernels as PK
from pastix_tpu.analyze.layout import plan_dense_tail
from pastix_tpu.config import Factorization, PastixConfig
from pastix_tpu.generators import poisson_3d
from pastix_tpu.numeric import kernels as K
from pastix_tpu.numeric.factorize import build_factorize_fn, coefinit
from pastix_tpu.pastix import Pastix


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(LL, "_INTERPRET", True)
    monkeypatch.setattr(PK, "_INTERPRET", True)


@pytest.fixture(scope="module")
def solver():
    s = Pastix(poisson_3d(12), PastixConfig(tile_size=32))
    s.order()
    s.symbfact()
    s.analyze()
    return s


def test_regroup_partitions_every_pair(solver):
    lay = solver.layout
    dt = plan_dense_tail(lay)
    levels = dt.levels_lo if dt is not None else lay.levels
    total = sum(lv.gemm_a.size for lv in levels)
    reduced, incoming, tail = LL.regroup_left(
        levels, lay.blk_col, dt.s if dt is not None else None,
        unrolled=set(range(len(levels))),
    )
    n_res = sum(lv.gemm_a.size for lv in reduced)
    n_inc = sum(i[0].size for i in incoming)
    n_tail = tail[0].size if tail is not None else 0
    assert n_res + n_inc + n_tail == total
    # with every level unrolled and a dense tail, nothing is left over
    # at the source except updates into Schur/scan targets (none here)
    assert n_res == 0
    # incoming targets really live in their assigned level
    for li, (ga, gb, gd, gk, nd) in enumerate(incoming):
        if ga.size:
            assert np.isin(lay.blk_col[gd], levels[li].cols).all()
    if tail is not None and n_tail:
        assert (lay.blk_col[tail[2]] >= dt.s).all()


@pytest.mark.parametrize("mode", ["bcache", "full"])
def test_ll_kernel_matches_xla(solver, mode):
    lay = solver.layout
    # a real level's incoming list: concatenate all updates into the
    # busiest level (regroup over all levels)
    reduced, incoming, _ = LL.regroup_left(
        lay.levels, lay.blk_col, None,
        unrolled=set(range(len(lay.levels))),
    )
    li = int(np.argmax([i[0].size for i in incoming]))
    ga, gb, gd, gk, _ = incoming[li]
    assert ga.size > 8
    rng = np.random.default_rng(0)
    pool = jnp.asarray(
        rng.standard_normal(lay.pool_shape).astype(np.float32)
    )
    ref = K.gemm_scatter(pool, ga, gb, gd, update_dtype=jnp.float32)
    sched = LL.build_ll_schedule(ga, gb, gd, group=3, cap=64, mode=mode)
    got = LL.gemm_scatter_ll(
        pool, sched, update_dtype=jnp.float32, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-5, atol=1e-5
    )


def test_ll_kernel_scaled(solver):
    lay = solver.layout
    reduced, incoming, _ = LL.regroup_left(
        lay.levels, lay.blk_col, None,
        unrolled=set(range(len(lay.levels))),
    )
    li = int(np.argmax([i[0].size for i in incoming]))
    ga, gb, gd, gk, _ = incoming[li]
    rng = np.random.default_rng(1)
    pool = jnp.asarray(
        rng.standard_normal(lay.pool_shape).astype(np.float32)
    )
    d = jnp.asarray(
        (1.0 + rng.random((lay.nbc, lay.T))).astype(np.float32)
    )
    ref = K.gemm_scatter(
        pool, ga, gb, gd, scale_cols=d[gk], update_dtype=jnp.float32
    )
    sched = LL.build_ll_schedule(ga, gb, gd, gk=gk, group=2, cap=64)
    got = LL.gemm_scatter_ll(
        pool, sched, d=d, update_dtype=jnp.float32, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-5, atol=1e-5
    )


@pytest.mark.parametrize(
    "kind", [Factorization.LLT, Factorization.LDLT, Factorization.LU]
)
def test_ll_factorization_matches_reference(solver, kind, monkeypatch):
    monkeypatch.setenv("PASTIX_E2_LL", "1")
    lay = solver.layout
    dt = plan_dense_tail(lay) if kind == Factorization.LLT else None
    for_lu = kind == Factorization.LU
    pool_np, pool_u_np = coefinit(lay, solver._A_perm, for_lu=for_lu)
    ref_fn = build_factorize_fn(
        lay, kind, update_dtype=jnp.float32, use_pallas=False,
        dense_tail=dt,
    )
    ll_fn = build_factorize_fn(
        lay, kind, update_dtype=jnp.float32, use_pallas=True,
        dense_tail=dt,
    )
    eps = jnp.float32(1e-10)
    if kind == Factorization.LLT:
        r = ref_fn(jnp.asarray(pool_np))
        g = ll_fn(jnp.asarray(pool_np))
        outs = [(g, r)]
    elif kind == Factorization.LDLT:
        r, rd_, _ = ref_fn(jnp.asarray(pool_np), eps)
        g, gd_, _ = ll_fn(jnp.asarray(pool_np), eps)
        outs = [(g, r), (gd_, rd_)]
    else:
        r, ru, _ = ref_fn(
            jnp.asarray(pool_np), jnp.asarray(pool_u_np), eps
        )
        g, gu, _ = ll_fn(
            jnp.asarray(pool_np), jnp.asarray(pool_u_np), eps
        )
        outs = [(g, r), (gu, ru)]
    for got, ref in outs:
        scale = float(jnp.max(jnp.abs(ref)))
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref),
            rtol=1e-4, atol=1e-5 * max(scale, 1.0),
        )
