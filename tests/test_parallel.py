"""Multi-device sharded paths on the 8-virtual-device CPU mesh — the
nompi.h-analog test harness (SURVEY.md section 4 point 3c)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pastix_tpu.config import Factorization, PastixConfig
from pastix_tpu.generators import laplacian_2d, poisson_3d
from pastix_tpu.numeric.factorize import coefinit
from pastix_tpu.parallel import (
    build_sharded_factorize_ldlt,
    build_sharded_factorize_llt,
    build_sharded_solve,
    make_mesh,
)
from pastix_tpu.pastix import Pastix
from pastix_tpu.solve import blocks_to_rhs, build_solve_fn, rhs_to_blocks


def _problem(nx=8, T=8):
    A = poisson_3d(nx)
    solver = Pastix(A, PastixConfig(tile_size=T))
    solver.analyze()
    pool0, _ = coefinit(solver.layout, solver._A_perm, dtype=np.float32)
    return A, solver, pool0


@pytest.fixture(scope="module")
def mesh():
    ndev = len(jax.devices())
    assert ndev >= 8, "conftest should provide 8 virtual devices"
    return make_mesh((2, 4), ("dp", "tp"), devices=jax.devices()[:8])


def test_sharded_llt_matches_single_device(mesh):
    A, solver, pool0 = _problem()
    layout = solver.layout
    fact_1d = __import__(
        "pastix_tpu.numeric.factorize", fromlist=["build_factorize_fn"]
    ).build_factorize_fn(layout, Factorization.LLT, use_pallas=False)
    ref = np.asarray(fact_1d(jnp.asarray(pool0)))

    fact_nd = build_sharded_factorize_llt(layout, mesh, tp_axis="tp")
    with mesh:
        out = np.asarray(fact_nd(jnp.asarray(pool0)))
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


def test_sharded_llt_solve_end_to_end(mesh):
    A, solver, pool0 = _problem()
    layout = solver.layout
    fact = build_sharded_factorize_llt(layout, mesh, tp_axis="tp")
    solv = build_sharded_solve(layout, mesh, dp_axis="dp")
    n_ext = solver._ext_n
    rng = np.random.default_rng(1)
    X = rng.standard_normal((n_ext, 4))
    B = solver._A_perm @ X
    with mesh:
        pool = fact(jnp.asarray(pool0))
        xb = solv(pool, jnp.asarray(rhs_to_blocks(layout, B, dtype=np.float32)))
    Xs = blocks_to_rhs(layout, np.asarray(xb))
    res = np.linalg.norm(B - solver._A_perm @ Xs) / np.linalg.norm(B)
    assert res < 1e-4


def test_sharded_llt_dense_tail(mesh):
    """Sharded factorization + solve with the dense terminal block."""
    A, solver, pool0 = _problem()
    layout = solver.layout
    dt = solver._dense_tail
    assert dt is not None
    fact = build_sharded_factorize_llt(
        layout, mesh, tp_axis="tp", dense_tail=dt
    )
    solv = build_sharded_solve(layout, mesh, dp_axis="dp", dense_tail=dt)
    n_ext = solver._ext_n
    rng = np.random.default_rng(2)
    X = rng.standard_normal((n_ext, 4))
    B = solver._A_perm @ X
    with mesh:
        pool = fact(jnp.asarray(pool0))
        xb = solv(pool, jnp.asarray(rhs_to_blocks(layout, B, dtype=np.float32)))
    Xs = blocks_to_rhs(layout, np.asarray(xb))
    res = np.linalg.norm(B - solver._A_perm @ Xs) / np.linalg.norm(B)
    assert res < 1e-4


def test_sharded_ldlt_matches_single_device(mesh):
    A, solver, pool0 = _problem()
    layout = solver.layout
    from pastix_tpu.numeric.factorize import build_factorize_fn

    fact_1d = build_factorize_fn(layout, Factorization.LDLT, use_pallas=False)
    eps = jnp.float32(1e-12)
    pr, dr, nr = fact_1d(jnp.asarray(pool0), eps)

    fact_nd = build_sharded_factorize_ldlt(layout, mesh, tp_axis="tp")
    with mesh:
        po, do, no = fact_nd(jnp.asarray(pool0), eps)
    np.testing.assert_allclose(np.asarray(po), np.asarray(pr), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(do), np.asarray(dr), rtol=2e-4, atol=2e-4)
    assert int(no) == int(nr)


def test_sharded_ldlt_solve_end_to_end(mesh):
    A, solver, pool0 = _problem()
    layout = solver.layout
    fact = build_sharded_factorize_ldlt(layout, mesh, tp_axis="tp")
    solve_fn = build_solve_fn(layout, Factorization.LDLT)
    b = solver._A_perm @ np.ones(solver._ext_n)
    with mesh:
        pool, d, _ = fact(jnp.asarray(pool0), jnp.float32(1e-12))
    xb = solve_fn(pool, d, jnp.asarray(rhs_to_blocks(layout, b, dtype=np.float32)))
    x = blocks_to_rhs(layout, np.asarray(xb))[:, 0]
    res = np.linalg.norm(b - solver._A_perm @ x) / np.linalg.norm(b)
    assert res < 1e-4


def test_sharded_lu_matches_single_device(mesh):
    from pastix_tpu.generators import random_unsym
    from pastix_tpu.numeric.factorize import build_factorize_fn
    from pastix_tpu.parallel import build_sharded_factorize_lu

    A = random_unsym(200, density=0.04, seed=6)
    solver = Pastix(
        A, PastixConfig(factorization=Factorization.LU, tile_size=8)
    )
    solver.analyze()
    layout = solver.layout
    pl0, pu0 = coefinit(layout, solver._A_perm, dtype=np.float32, for_lu=True)
    eps = jnp.float32(1e-10)

    fact_1d = build_factorize_fn(layout, Factorization.LU, use_pallas=False)
    pr, ur, nr = fact_1d(jnp.asarray(pl0), jnp.asarray(pu0), eps)

    fact_nd = build_sharded_factorize_lu(layout, mesh, tp_axis="tp")
    with mesh:
        po, uo, no = fact_nd(jnp.asarray(pl0), jnp.asarray(pu0), eps)
    np.testing.assert_allclose(np.asarray(po), np.asarray(pr), rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(uo), np.asarray(ur), rtol=2e-3, atol=2e-3)
    assert int(no) == int(nr)

    # end-to-end solve with the sharded factors
    solve_fn = build_solve_fn(layout, Factorization.LU)
    b = solver._A_perm @ np.ones(solver._ext_n)
    xb = solve_fn(po, uo, jnp.asarray(rhs_to_blocks(layout, b, dtype=np.float32)))
    x = blocks_to_rhs(layout, np.asarray(xb))[:, 0]
    res = np.linalg.norm(b - solver._A_perm @ x) / np.linalg.norm(b)
    assert res < 1e-3


def test_subtree_mapping_covers_all_columns(mesh):
    from pastix_tpu.parallel import proportional_mapping

    A, solver, _ = _problem()
    owner = proportional_mapping(solver.layout, 4)
    assert owner.shape[0] == solver.layout.nbc
    locals_ = owner[owner >= 0]
    assert locals_.size > 0 and (owner == -1).sum() > 0
    assert set(np.unique(locals_)) <= set(range(4))


def test_subtree_factorize_matches_single_device(mesh):
    from pastix_tpu.numeric.factorize import build_factorize_fn
    from pastix_tpu.parallel import build_subtree_factorize_llt
    from pastix_tpu.parallel.mesh import make_mesh

    A, solver, pool0 = _problem()
    layout = solver.layout
    ref = np.asarray(
        build_factorize_fn(layout, Factorization.LLT, use_pallas=False)(
            jnp.asarray(pool0)
        )
    )
    m4 = make_mesh((4,), ("tp",), devices=jax.devices()[:4])
    fact = build_subtree_factorize_llt(layout, m4)
    with m4:
        out = np.asarray(fact(jnp.asarray(pool0)))
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


def test_owner_distribution_report_balance():
    """Static balance/comm accounting (blend distribPart/cost analog):
    the owner plan's padded-flop imbalance stays <= 25% on a ~100k-dof
    plan (VERDICT r4 item 4)."""
    from pastix_tpu.generators import poisson_3d
    from pastix_tpu.pastix import Pastix
    from pastix_tpu.config import PastixConfig
    from pastix_tpu.parallel.owner import (
        build_pool_sharding, distribution_report)

    A = poisson_3d(47)  # 103,823 dof
    s = Pastix(A, PastixConfig(tile_size=32))
    s.order(); s.symbfact(); s.analyze()
    sh = build_pool_sharding(s.layout, 8, dense_tail=s._dense_tail)
    rep = distribution_report(s.layout, sh, dense_tail=s._dense_tail)
    assert rep["ndev"] == 8
    assert rep["tiles"].sum() == s.layout.npool
    assert rep["flops"].sum() > 0
    assert rep["flop_imbalance"] <= 0.25, rep["flop_imbalance"]
    # halo volume is bounded by the pool itself (sanity)
    assert rep["halo_bytes"].sum() < s.layout.npool * 32 * 32 * 4 * 8
