"""Whole-sweep Pallas solve kernel vs the XLA reference sweeps
(interpret mode on CPU), plus the fast doubling diag-tile inverse and
the ELL SpMV used by the sweep-based device refinement.

Reference: the updown phase (src/sopalin/src/updo.c, SURVEY.md §3.4);
the refinement SpMV (csc_intern_compute.c, §2 row 12).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax

import pastix_tpu.numeric.sweep_kernels as SW
import pastix_tpu.solve as sm
from pastix_tpu.config import Factorization, PastixConfig
from pastix_tpu.generators import poisson_3d
from pastix_tpu.numeric.factorize import (
    _tri_inverse_doubling,
    build_diag_inverse_fn,
)
from pastix_tpu.pastix import Pastix


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(SW, "_INTERPRET", True)


def _solver(kind, nx=12, T=32):
    s = Pastix(poisson_3d(nx), PastixConfig(tile_size=T, factorization=kind))
    s.order()
    s.symbfact()
    s.analyze()
    s.factorize()
    return s


@pytest.mark.parametrize(
    "kind", [Factorization.LLT, Factorization.LDLT, Factorization.LU]
)
@pytest.mark.parametrize("nrhs", [1, 3])
def test_sweep_solve_matches_inv_path(kind, nrhs):
    s = _solver(kind)
    lay, f = s.layout, s.factors
    rng = np.random.default_rng(0)
    b = rng.standard_normal((s.A.n, nrhs))
    bb = jnp.asarray(
        sm.rhs_to_blocks(lay, s._perm_rhs(b), dtype=np.float32)
    )
    dinv_fn = build_diag_inverse_fn(lay, kind)
    ref_fn = sm.build_solve_fn_inv(lay, kind)
    swp_fn = sm.build_solve_fn_sweep(lay, kind, interpret=True)
    if kind == Factorization.LU:
        dinv_l, dinv_u = dinv_fn(f.pool, f.pool_u)
        xr = ref_fn(f.pool, f.pool_u, dinv_l, dinv_u, bb)
        xs = swp_fn(f.pool, f.pool_u, dinv_l, dinv_u, bb)
    elif kind == Factorization.LDLT:
        dinv = dinv_fn(f.pool)
        xr = ref_fn(f.pool, dinv, f.d, bb)
        xs = swp_fn(f.pool, dinv, f.d, bb)
    else:
        dinv = dinv_fn(f.pool)
        xr = ref_fn(f.pool, dinv, bb)
        xs = swp_fn(f.pool, dinv, bb)
    scale = float(jnp.max(jnp.abs(xr)))
    assert float(jnp.max(jnp.abs(xs - xr))) < 1e-5 * max(scale, 1.0)


def test_sweep_schedule_covers_every_tile():
    s = _solver(Factorization.LLT)
    lay = s.layout
    sched = SW.build_sweep_schedule(lay)
    for key in ("fwd", "bwd"):
        real = np.concatenate(
            [c["tidx"][c["dst"] != lay.nbc] for c in sched[key]]
        )
        kd = np.concatenate(
            [c["kd"][c["dst"] != lay.nbc] for c in sched[key]]
        )
        # diag ops: one per block column; update ops: every off-diag tile
        assert (kd == 1).sum() == lay.nbc
        n_offdiag = lay.npool - lay.nbc
        assert (kd == 0).sum() == n_offdiag
        # update ops reference each off-diag pool tile exactly once
        upd = np.sort(real[kd == 0])
        diag_pool = lay.lookup(np.arange(lay.nbc), np.arange(lay.nbc))
        expect = np.sort(
            np.setdiff1d(np.arange(lay.npool), diag_pool)
        )
        np.testing.assert_array_equal(upd, expect)


@pytest.mark.parametrize("lower", [True, False])
@pytest.mark.parametrize("unit", [True, False])
def test_tri_inverse_doubling_matches_triangular_solve(lower, unit):
    rng = np.random.default_rng(1)
    T = 64
    D = (rng.standard_normal((4, T, T)) / np.sqrt(T)).astype(np.float32)
    D = np.tril(D) if lower else np.triu(D)
    for i in range(4):
        np.fill_diagonal(D[i], np.abs(np.diag(D[i])) + 1.0)
    X = np.asarray(_tri_inverse_doubling(jnp.asarray(D), lower, unit))
    eye = jnp.broadcast_to(jnp.eye(T, dtype=jnp.float32), D.shape)
    Xr = np.asarray(
        lax.linalg.triangular_solve(
            jnp.asarray(D), eye, left_side=True, lower=lower,
            unit_diagonal=unit,
        )
    )
    rel = np.max(np.abs(X - Xr)) / max(np.max(np.abs(Xr)), 1.0)
    assert rel < 1e-5


def test_ell_spmv_matches_scipy():
    from pastix_tpu.krylov import build_ell
    import scipy.sparse as sp

    s = _solver(Factorization.LLT)
    A = sp.coo_matrix(s._A_perm)
    nflat = s.layout.nbc * s.layout.T
    cols, vals = build_ell(A, nflat, np.float32)
    rng = np.random.default_rng(2)
    x = rng.standard_normal(nflat).astype(np.float32)
    y = (vals * x[cols]).sum(axis=1)
    y_ref = np.zeros(nflat, np.float32)
    y_ref[: A.shape[0]] = (A.tocsr() @ x[: A.shape[1]]).astype(np.float32)
    np.testing.assert_allclose(y, y_ref, rtol=1e-5, atol=1e-5)


def test_two_float_primitives_are_exact():
    from pastix_tpu.krylov import _two_prod, _two_sum, df_split

    rng = np.random.default_rng(5)
    a64 = rng.standard_normal(1000) * 1e3
    b64 = rng.standard_normal(1000)
    a = jnp.asarray(a64.astype(np.float32))
    b = jnp.asarray(b64.astype(np.float32))
    p, e = _two_prod(a, b)
    exact = np.float64(np.asarray(a)) * np.float64(np.asarray(b))
    err = np.abs(
        (np.asarray(p, np.float64) + np.asarray(e, np.float64)) - exact
    )
    assert err.max() == 0.0  # TwoProd is exact in fp32 pairs
    s, e2 = _two_sum(a, b)
    exact = np.float64(np.asarray(a)) + np.float64(np.asarray(b))
    err = np.abs(
        (np.asarray(s, np.float64) + np.asarray(e2, np.float64)) - exact
    )
    assert err.max() == 0.0
    hi, lo = df_split(a64)
    assert np.abs(
        (hi.astype(np.float64) + lo.astype(np.float64)) - a64
    ).max() < 1e-10 * np.abs(a64).max()


@pytest.mark.parametrize("unroll", [1, 3])
def test_device_step_refine_reaches_fp64_grade(unroll):
    """The two-float step refine descends to ~1e-13 relative residual —
    fp64-grade accuracy with fp32-only device arithmetic (SURVEY §7
    hard-part 4; reference raff.c refines in double).  unroll=3 chains
    three Richardson steps per dispatch (the tunnel round-trip
    amortization the TPU flagship runs) — same fixed point."""
    from pastix_tpu.krylov import (
        build_device_refine_step_fn, build_ell, df_split,
    )
    import scipy.sparse as sp

    s = _solver(Factorization.LLT)
    lay, f = s.layout, s.factors
    dinv = build_diag_inverse_fn(lay, Factorization.LLT)(f.pool)
    init, step = build_device_refine_step_fn(
        lay, Factorization.LLT, unroll=unroll
    )
    nflat = lay.nbc * lay.T
    cols, vals = build_ell(sp.coo_matrix(s._A_perm), nflat, np.float64)
    vh, vl = df_split(vals)
    b = np.ones(s.A.n)
    b_ext = s._perm_rhs(b)
    bpad = np.zeros(nflat)
    bpad[: b_ext.shape[0]] = b_ext
    bh, bl = df_split(bpad)
    fa = (f.pool, dinv)
    xh, xl = init(fa, jnp.asarray(bh.reshape(lay.nbc, lay.T, 1)))
    bn = np.linalg.norm(bpad)
    for _ in range(4):
        xh, xl, r2 = step(
            fa, jnp.asarray(cols), jnp.asarray(vh), jnp.asarray(vl),
            jnp.asarray(bh), jnp.asarray(bl), xh, xl,
        )
    x64 = np.asarray(xh, np.float64) + np.asarray(xl, np.float64)
    xs = s._unperm_sol(x64[: b_ext.shape[0]])
    true = np.linalg.norm(b - s.A.to_scipy() @ xs) / np.linalg.norm(b)
    assert true < 1e-11
    # the device-side estimate must agree with the true fp64 residual
    assert abs(np.sqrt(float(r2)) / bn - true) < 10 * true + 1e-13


@pytest.mark.parametrize(
    "kind", [Factorization.LLT, Factorization.LDLT, Factorization.LU]
)
def test_device_refine_with_sweep_precond(kind):
    """The krylov fused refine with use_sweep reaches the fp32 floor in
    interpret mode (the product wires this on the TPU backend)."""
    from pastix_tpu.krylov import build_device_refine_fn, build_ell
    import scipy.sparse as sp

    s = _solver(kind)
    lay, f = s.layout, s.factors
    dinv_fn = build_diag_inverse_fn(lay, kind)
    if kind == Factorization.LU:
        dinv_l, dinv_u = dinv_fn(f.pool, f.pool_u)
        fa = (f.pool, f.pool_u, dinv_l, dinv_u)
    elif kind == Factorization.LDLT:
        fa = (f.pool, dinv_fn(f.pool), f.d)
    else:
        fa = (f.pool, dinv_fn(f.pool))
    fn = build_device_refine_fn(
        lay, kind, use_sweep=True, amat_format="ell"
    )
    nflat = lay.nbc * lay.T
    cols, vals = build_ell(sp.coo_matrix(s._A_perm), nflat, np.float32)
    b = np.ones(s.A.n)
    bb = jnp.asarray(
        sm.rhs_to_blocks(lay, s._perm_rhs(b), dtype=np.float32)
    )
    x, it, rel = fn(
        fa, jnp.asarray(cols), jnp.asarray(vals),
        jnp.zeros((0,), jnp.float32), bb,
        np.float32(1e-6), np.int32(20),
    )
    assert float(rel) < 1e-5
    xs = sm.blocks_to_rhs(lay, np.asarray(x))[:, 0]
    x_ext = s._unperm_sol(xs)
    r = np.linalg.norm(b - s.A.to_scipy() @ x_ext) / np.linalg.norm(b)
    assert r < 1e-5
