"""Triangular solves (reference phase 5: updown / up_down_smp).

Level-batched forward/backward substitution over the same tile pool
(reference ``src/sopalin/src/updo.c`` — SURVEY.md section 2 row 13 and
call stack 3.4).  Where the reference exchanges RHS segments by MPI per
elimination level, here each level is one batched (T,T)x(T,R) matmul plus
a scatter-add — the whole sweep is a single jitted program.  Like the
factorization, heavy levels are unrolled and the long tail of small levels
runs as lax.scan over padded tables (backward sweeps scan in reverse).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from typing import Optional

from pastix_tpu.analyze.layout import SolverLayout
from pastix_tpu.config import Factorization
from pastix_tpu.numeric.factorize import Factors

from pastix_tpu.numeric.kernels import matmul_precision
_HI = matmul_precision()

import os as _os_mod

# Solve sweeps chunk tighter than the factorization (kernels._GEMM_CHUNK):
# the solve program is read-only over the pool, so XLA can schedule many
# levels' un-scanned gathers CONCURRENTLY — several 0.5-0.8 GB temps live
# at once OOM'd the 1M flagship.  A lax.scan's carried dependency forces
# sequencing, so levels above this threshold are bounded AND serialized.
_SOLVE_CHUNK = int(_os_mod.environ.get("PASTIX_SOLVE_CHUNK", "4096"))


def _solve_plan(layout: SolverLayout, dense_tail=None):
    """Unroll/scan plan with only the solve-relevant fields."""
    from pastix_tpu.numeric.grouping import group_levels

    def conv_unroll(lv):
        return {
            "cols": np.asarray(lv.cols),
            "diag": np.asarray(lv.diag),
            "tp": np.asarray(lv.trsm_panel),
            "tr": np.asarray(lv.trsm_row),
            "tc": np.asarray(lv.trsm_col),
        }

    def conv_scan(g):
        return {
            "cols": np.asarray(g.cols),
            "diag": np.asarray(g.diag),
            "tp": np.asarray(g.trsm_panel),
            "tr": np.asarray(g.trsm_row),
            "tc": np.asarray(g.trsm_col),
        }

    levels = dense_tail.levels_lo if dense_tail is not None else layout.levels
    return [
        (tag, conv_unroll(g) if tag == "unroll" else conv_scan(g))
        for tag, g in group_levels(levels, layout.npool, layout.nbc)
    ]


def _tail_ops(layout: SolverLayout, dense_tail, hermitian: bool):
    """Dense terminal block solve: gather the tail factor once, then the
    forward/backward sweeps over its columns are ONE dense triangular
    solve each (instead of O(q) per-tile-column levels)."""
    t_p = np.asarray(dense_tail.p_idx)
    t_qi = np.asarray(dense_tail.qi)
    t_qj = np.asarray(dense_tail.qj)
    q, s, T = dense_tail.q, dense_tail.s, layout.T

    def gather(pool):
        dense = jnp.zeros((q, T, q, T), pool.dtype)
        dense = dense.at[t_qi, :, t_qj, :].set(pool[t_p])
        return dense.reshape(q * T, q * T)

    def fwd(L, y):
        yt = y[s:].reshape(q * T, -1)
        sol = lax.linalg.triangular_solve(L, yt, left_side=True, lower=True)
        return y.at[s:].set(sol.reshape(q, T, -1))

    def bwd(L, x):
        xt = x[s:].reshape(q * T, -1)
        sol = lax.linalg.triangular_solve(
            L, xt, left_side=True, lower=True, transpose_a=True,
            conjugate_a=hermitian,
        )
        return x.at[s:].set(sol.reshape(q, T, -1))

    return gather, fwd, bwd


def _diag_solve_chunked(pool_diag, y, diag, cols, solve_one):
    """y[cols] = solve_one(pool_diag[diag], y[cols]) over bounded chunks
    (a bottom level holds ~12k diagonal tiles at 1M dof — unchunked
    gathers left several 0.8 GB temps live at once)."""
    from pastix_tpu.numeric.factorize import _scan_chunks

    nbc = y.shape[0]

    def body(y, dg, cl):
        sol = solve_one(pool_diag[dg], y[jnp.minimum(cl, nbc - 1)])
        return y.at[cl].set(sol)

    return _scan_chunks(y, (diag, cols), (pool_diag.shape[0], nbc), body,
                        chunk=_SOLVE_CHUNK)


def _fwd_level(pool, y, t, unit):
    from pastix_tpu.numeric.factorize import _scan_chunks

    y = _diag_solve_chunked(
        pool, y, t["diag"], t["cols"],
        lambda D, yc: lax.linalg.triangular_solve(
            D, yc, left_side=True, lower=True, unit_diagonal=unit,
        ),
    )
    if t["tp"].size:
        nbc = y.shape[0]

        # chunked: gathering a whole level's panels materializes
        # (nt, T, T) — >3 GB on the widest 1M-dof levels, which pushed
        # the solve program past HBM where the factorization fit
        def body(y, tp, tc, tr):
            contrib = jnp.einsum(
                "bij,bjr->bir", pool[tp], y[jnp.minimum(tc, nbc - 1)],
                preferred_element_type=y.dtype, precision=_HI,
            )
            return y.at[tr].add(-contrib)

        y = _scan_chunks(
            y, (t["tp"], t["tc"], t["tr"]), (pool.shape[0], nbc, nbc), body,
            chunk=_SOLVE_CHUNK,
        )
    return y


def _bwd_level(pool_contrib, pool_diag, x, t, lower_t, unit, conj=False):
    """One backward level: gather transposed contributions, then diag solve.

    pool_contrib supplies the off-diagonal tiles (L for symmetric kinds,
    Ut for LU); pool_diag the diagonal tiles.  ``conj``: Hermitian sweep
    (L^H instead of L^T; no-op for real dtypes).
    """
    from pastix_tpu.numeric.factorize import _scan_chunks

    if t["tp"].size:
        nbc = x.shape[0]

        def body(x, tp, tc, tr):
            tiles = pool_contrib[tp]
            if conj and jnp.iscomplexobj(tiles):
                tiles = jnp.conj(tiles)
            contrib = jnp.einsum(
                "bij,bir->bjr", tiles, x[jnp.minimum(tr, nbc - 1)],
                preferred_element_type=x.dtype, precision=_HI,
            )
            return x.at[tc].add(-contrib)

        x = _scan_chunks(
            x, (t["tp"], t["tc"], t["tr"]),
            (pool_contrib.shape[0], nbc, nbc), body, chunk=_SOLVE_CHUNK,
        )
    x = _diag_solve_chunked(
        pool_diag, x, t["diag"], t["cols"],
        lambda D, xc: lax.linalg.triangular_solve(
            D, xc, left_side=True, lower=lower_t, transpose_a=lower_t,
            conjugate_a=conj and lower_t, unit_diagonal=unit,
        ),
    )
    return x


def _run_fwd(plan, pool, y, unit):
    for tag, t in plan:
        if tag == "unroll":
            y = _fwd_level(pool, y, t, unit)
        else:
            y, _ = lax.scan(lambda c, x: (_fwd_level(pool, c, x, unit), None), y, t)
    return y


def _run_bwd(plan, pool_contrib, pool_diag, x, lower_t, unit, conj=False):
    for tag, t in reversed(plan):
        if tag == "unroll":
            x = _bwd_level(pool_contrib, pool_diag, x, t, lower_t, unit, conj)
        else:
            x, _ = lax.scan(
                lambda c, xs: (
                    _bwd_level(pool_contrib, pool_diag, c, xs, lower_t, unit, conj),
                    None,
                ),
                x, t, reverse=True,
            )
    return x


def build_solve_fn(layout: SolverLayout, kind: Factorization,
                   hermitian: Optional[bool] = None, dense_tail=None):
    """Jitted solve program.

    Signatures: LLT fn(pool, b); LDLT fn(pool, d, b); LU fn(pool, pool_u, b).
    ``hermitian`` mirrors build_factorize_fn (backward sweep uses L^H).
    ``dense_tail``: the factorization's dense terminal block plan — the
    tail's sweeps become one dense triangular solve each (LLT only).
    """
    if dense_tail is not None and not (
        kind == Factorization.LLT and hermitian in (None, True)
    ):
        dense_tail = None
    plan = _solve_plan(layout, dense_tail)
    if hermitian is None:
        hermitian = kind in (Factorization.LLT, Factorization.LDLH)

    if kind == Factorization.LLT:
        if dense_tail is not None:
            gather, tfwd, tbwd = _tail_ops(layout, dense_tail, hermitian)

            def solve_llt_tail(pool, b):
                y = _run_fwd(plan, pool, b, unit=False)
                Ltail = gather(pool)
                y = tbwd(Ltail, tfwd(Ltail, y))
                return _run_bwd(
                    plan, pool, pool, y, lower_t=True, unit=False,
                    conj=hermitian,
                )

            return jax.jit(solve_llt_tail)

        def solve_llt(pool, b):
            y = _run_fwd(plan, pool, b, unit=False)
            return _run_bwd(
                plan, pool, pool, y, lower_t=True, unit=False, conj=hermitian
            )

        return jax.jit(solve_llt)

    if kind in (Factorization.LDLT, Factorization.LDLH):

        def solve_ldlt(pool, d, b):
            y = _run_fwd(plan, pool, b, unit=True)
            y = y / d[..., None]
            return _run_bwd(
                plan, pool, pool, y, lower_t=True, unit=True, conj=hermitian
            )

        return jax.jit(solve_ldlt)

    if kind == Factorization.LU:

        def solve_lu(pool, pool_u, b):
            y = _run_fwd(plan, pool, b, unit=True)
            return _run_bwd(plan, pool_u, pool, y, lower_t=False, unit=False)

        return jax.jit(solve_lu)

    raise ValueError(f"unsupported factorization: {kind}")


def build_fwd_bwd_fns(layout: SolverLayout, kind: Factorization,
                      hermitian: Optional[bool] = None):
    """Split jitted forward / backward sweeps (used by the Schur path:
    eliminate, dense-solve the Schur system, back-substitute)."""
    plan = _solve_plan(layout)
    if hermitian is None:
        hermitian = kind in (Factorization.LLT, Factorization.LDLH)

    if kind == Factorization.LLT:
        fwd = jax.jit(lambda pool, b: _run_fwd(plan, pool, b, unit=False))
        bwd = jax.jit(
            lambda pool, y: _run_bwd(
                plan, pool, pool, y, lower_t=True, unit=False, conj=hermitian
            )
        )
    elif kind in (Factorization.LDLT, Factorization.LDLH):
        fwd = jax.jit(
            lambda pool, d, b: _run_fwd(plan, pool, b, unit=True) / d[..., None]
        )
        bwd = jax.jit(
            lambda pool, d, y: _run_bwd(
                plan, pool, pool, y, lower_t=True, unit=True, conj=hermitian
            )
        )
    else:  # LU
        fwd = jax.jit(
            lambda pool, pool_u, b: _run_fwd(plan, pool, b, unit=True)
        )
        bwd = jax.jit(
            lambda pool, pool_u, y: _run_bwd(
                plan, pool_u, pool, y, lower_t=False, unit=False
            )
        )
    return fwd, bwd


def _fn_args(factors: Factors):
    if factors.kind == Factorization.LLT:
        return (factors.pool,)
    if factors.kind in (Factorization.LDLT, Factorization.LDLH):
        return (factors.pool, factors.d)
    return (factors.pool, factors.pool_u)


def run_fwd(factors: Factors, b_perm: np.ndarray, fwd_fn) -> np.ndarray:
    layout = factors.layout
    # .dtype, NOT np.asarray(...).dtype — materializing the pool pulls
    # GBs through the device tunnel per call (measured 2.4 s/solve at 1M)
    bb = jnp.asarray(
        rhs_to_blocks(layout, b_perm, dtype=factors.pool.dtype)
    )
    yb = fwd_fn(*_fn_args(factors), bb)
    out = blocks_to_rhs(layout, yb)
    return out if np.asarray(b_perm).ndim > 1 else out[:, 0]


def run_bwd(factors: Factors, y_perm: np.ndarray, bwd_fn) -> np.ndarray:
    layout = factors.layout
    yb = jnp.asarray(
        rhs_to_blocks(layout, y_perm, dtype=factors.pool.dtype)
    )
    xb = bwd_fn(*_fn_args(factors), yb)
    out = blocks_to_rhs(layout, xb)
    return out if np.asarray(y_perm).ndim > 1 else out[:, 0]


# ---------------------------------------------------------------------------
# host-level helpers: pad/permute RHS <-> block layout
# ---------------------------------------------------------------------------


def rhs_to_blocks(layout: SolverLayout, b_perm: np.ndarray, dtype=np.float32):
    """(n, R) permuted RHS -> (nbc, T, R) padded block layout."""
    n, T, nbc = layout.n, layout.T, layout.nbc
    b = np.asarray(b_perm, dtype=dtype)
    if b.ndim == 1:
        b = b[:, None]
    pad = np.zeros((nbc * T, b.shape[1]), dtype=dtype)
    pad[:n] = b
    return pad.reshape(nbc, T, -1)


def blocks_to_rhs(layout: SolverLayout, xb) -> np.ndarray:
    """(nbc, T, R) block layout -> (n, R)."""
    x = np.asarray(xb).reshape(layout.nbc * layout.T, -1)
    return x[: layout.n]


def solve(factors: Factors, b_perm: np.ndarray, solve_fn=None) -> np.ndarray:
    """Host driver: solve for (n,R) permuted RHS, returns (n,R)."""
    layout = factors.layout
    fn = solve_fn or build_solve_fn(layout, factors.kind)
    # .dtype, not np.asarray(...).dtype: the pool may be sharded across
    # devices (owner-computes path) and must not be gathered to host here
    bb = jnp.asarray(rhs_to_blocks(layout, b_perm, dtype=factors.pool.dtype))
    if factors.kind == Factorization.LLT:
        xb = fn(factors.pool, bb)
    elif factors.kind in (Factorization.LDLT, Factorization.LDLH):
        xb = fn(factors.pool, factors.d, bb)
    else:
        xb = fn(factors.pool, factors.pool_u, bb)
    out = blocks_to_rhs(layout, xb)
    return out if np.asarray(b_perm).ndim > 1 else out[:, 0]


# ---------------------------------------------------------------------------
# fast solve: diagonal-tile inverses -> every level is pure matmuls
# ---------------------------------------------------------------------------


def _fwd_level_inv(pool, dinv, y, t):
    y = _diag_solve_chunked(
        dinv, y, t["cols"], t["cols"],
        lambda D, yc: jnp.einsum(
            "bij,bjr->bir", D, yc,
            preferred_element_type=y.dtype, precision=_HI,
        ),
    )
    if t["tp"].size:
        from pastix_tpu.numeric.factorize import _scan_chunks

        nbc = y.shape[0]

        def body(y, tp, tc, tr):
            contrib = jnp.einsum(
                "bij,bjr->bir", pool[tp], y[jnp.minimum(tc, nbc - 1)],
                preferred_element_type=y.dtype, precision=_HI,
            )
            return y.at[tr].add(-contrib)

        y = _scan_chunks(
            y, (t["tp"], t["tc"], t["tr"]), (pool.shape[0], nbc, nbc), body,
            chunk=_SOLVE_CHUNK,
        )
    return y


def _bwd_level_inv(pool_contrib, dinv, x, t, transpose_d, conj=False):
    """Backward level with an inverse diag apply.

    transpose_d: apply dinv^T (symmetric kinds use the lower inverse
    transposed); False for LU (dinv is already the upper inverse).
    """
    if t["tp"].size:
        from pastix_tpu.numeric.factorize import _scan_chunks

        nbc = x.shape[0]

        def body(x, tp, tc, tr):
            tiles = pool_contrib[tp]
            if conj and jnp.iscomplexobj(tiles):
                tiles = jnp.conj(tiles)
            contrib = jnp.einsum(
                "bij,bir->bjr", tiles, x[jnp.minimum(tr, nbc - 1)],
                preferred_element_type=x.dtype, precision=_HI,
            )
            return x.at[tc].add(-contrib)

        x = _scan_chunks(
            x, (t["tp"], t["tc"], t["tr"]),
            (pool_contrib.shape[0], nbc, nbc), body, chunk=_SOLVE_CHUNK,
        )
    eq = "bji,bjr->bir" if transpose_d else "bij,bjr->bir"

    def apply_d(D, xc):
        if conj and jnp.iscomplexobj(D):
            D = jnp.conj(D)
        return jnp.einsum(
            eq, D, xc, preferred_element_type=x.dtype, precision=_HI
        )

    x = _diag_solve_chunked(dinv, x, t["cols"], t["cols"], apply_d)
    return x


def _run_fwd_inv(plan, pool, dinv, y):
    for tag, t in plan:
        if tag == "unroll":
            y = _fwd_level_inv(pool, dinv, y, t)
        else:
            y, _ = lax.scan(
                lambda c, x: (_fwd_level_inv(pool, dinv, c, x), None), y, t
            )
    return y


def _run_bwd_inv(plan, pool_contrib, dinv, x, transpose_d, conj=False):
    for tag, t in reversed(plan):
        if tag == "unroll":
            x = _bwd_level_inv(pool_contrib, dinv, x, t, transpose_d, conj)
        else:
            x, _ = lax.scan(
                lambda c, xs: (
                    _bwd_level_inv(pool_contrib, dinv, c, xs, transpose_d, conj),
                    None,
                ),
                x, t, reverse=True,
            )
    return x


def build_solve_fn_inv(layout: SolverLayout, kind: Factorization,
                       hermitian: Optional[bool] = None, dense_tail=None):
    """Jitted fast solve using precomputed diagonal-tile inverses
    (factorize.build_diag_inverse_fn).  Signatures:
      LLT : fn(pool, dinv, b)
      LDLT: fn(pool, dinv, d, b)
      LU  : fn(pool, pool_u, dinv_l, dinv_u, b)
    """
    if dense_tail is not None and not (
        kind == Factorization.LLT and hermitian in (None, True)
    ):
        dense_tail = None
    plan = _solve_plan(layout, dense_tail)
    if hermitian is None:
        hermitian = kind in (Factorization.LLT, Factorization.LDLH)

    if kind == Factorization.LLT:
        if dense_tail is not None:
            gather, tfwd, tbwd = _tail_ops(layout, dense_tail, hermitian)

            def solve_llt_tail(pool, dinv, b):
                y = _run_fwd_inv(plan, pool, dinv, b)
                Ltail = gather(pool)
                y = tbwd(Ltail, tfwd(Ltail, y))
                return _run_bwd_inv(plan, pool, dinv, y, True, conj=hermitian)

            return jax.jit(solve_llt_tail)

        def solve_llt(pool, dinv, b):
            y = _run_fwd_inv(plan, pool, dinv, b)
            return _run_bwd_inv(plan, pool, dinv, y, True, conj=hermitian)

        return jax.jit(solve_llt)

    if kind in (Factorization.LDLT, Factorization.LDLH):

        def solve_ldlt(pool, dinv, d, b):
            y = _run_fwd_inv(plan, pool, dinv, b)
            y = y / d[..., None]
            return _run_bwd_inv(plan, pool, dinv, y, True, conj=hermitian)

        return jax.jit(solve_ldlt)

    if kind == Factorization.LU:

        def solve_lu(pool, pool_u, dinv_l, dinv_u, b):
            y = _run_fwd_inv(plan, pool, dinv_l, b)
            return _run_bwd_inv(plan, pool_u, dinv_u, y, False)

        return jax.jit(solve_lu)

    raise ValueError(f"unsupported factorization: {kind}")


def build_solve_fn_sweep(layout: SolverLayout, kind: Factorization,
                         hermitian: Optional[bool] = None,
                         interpret: Optional[bool] = None):
    """Jitted solve using the whole-sweep Pallas kernel
    (numeric/sweep_kernels.py): the RHS stays VMEM-resident through each
    triangular sweep and every pool tile streams through a deep DMA
    pipeline — no per-level dispatch, no gathered HBM transients (the
    two costs that dominate the classic XLA sweeps at scale).

    The op stream covers ALL levels including the dense-tail columns
    (their factored tiles live in the pool), so no dense-tail special
    case — and none of its 8·m² solve temps.  Signatures match
    build_solve_fn_inv.  Real dtypes only (callers gate complex off).
    """
    from pastix_tpu.numeric.sweep_kernels import (
        build_sweep_schedule, sweep_fwd, sweep_bwd, _to_rowvec,
        _from_rowvec,
    )

    sched = build_sweep_schedule(layout)
    nbc, T = layout.nbc, layout.T
    if hermitian is None:
        hermitian = kind in (Factorization.LLT, Factorization.LDLH)

    if kind == Factorization.LLT:

        def solve_llt(pool, dinv, b):
            y2 = _to_rowvec(b)
            y2 = sweep_fwd(pool, dinv, y2, sched, interpret=interpret)
            y2 = sweep_bwd(pool, dinv, y2, sched, interpret=interpret)
            return _from_rowvec(y2, nbc, T).astype(b.dtype)

        return jax.jit(solve_llt)

    if kind in (Factorization.LDLT, Factorization.LDLH):

        def solve_ldlt(pool, dinv, d, b):
            R = b.shape[-1]
            y2 = _to_rowvec(b)
            y2 = sweep_fwd(pool, dinv, y2, sched, interpret=interpret)
            y2 = (y2.reshape(nbc, R, T) / d[:, None, :]).reshape(
                nbc * R, T
            )
            y2 = sweep_bwd(pool, dinv, y2, sched, interpret=interpret)
            return _from_rowvec(y2, nbc, T).astype(b.dtype)

        return jax.jit(solve_ldlt)

    if kind == Factorization.LU:

        def solve_lu(pool, pool_u, dinv_l, dinv_u, b):
            y2 = _to_rowvec(b)
            y2 = sweep_fwd(pool, dinv_l, y2, sched, interpret=interpret)
            y2 = sweep_bwd(
                pool_u, dinv_u, y2, sched, lu=True, interpret=interpret
            )
            return _from_rowvec(y2, nbc, T).astype(b.dtype)

        return jax.jit(solve_lu)

    raise ValueError(f"unsupported factorization: {kind}")


def build_solve_refine_fn(layout: SolverLayout, kind: Factorization,
                          hermitian: Optional[bool] = None, dense_tail=None):
    """Fused jitted solve + Richardson refinement, entirely on device.

    One dispatch over the (45 ms round-trip) tunnel instead of one per
    refinement iteration: x = M^{-1}b, then while ||b-Ax|| > eps·||b||
    iterate x += M^{-1}(b - Ax) with a device-side COO SpMV
    (``lax.while_loop``; reference pastix_task_raff / pivot_smp).  fp32
    residual accumulation reaches ~1e-6 relative; the host fp64 loop
    (refine.py) finishes the descent to reference-grade eps when asked.

    LLT only (fast-solve inverse-diag path).  Returns
    fn(pool, dinv, arow, acol, avals, b, eps, itermax) ->
    (x, iters, rel_res) with arow/acol/avals the COO of the full
    extended permuted A and b the (nbc, T, R) block RHS.
    """
    assert kind == Factorization.LLT, "device refinement: LLT only for now"
    if hermitian is None:
        hermitian = True
    plan = _solve_plan(layout, dense_tail)
    tail = (
        _tail_ops(layout, dense_tail, hermitian)
        if dense_tail is not None
        else None
    )
    nbc, T = layout.nbc, layout.T

    def solve_once(pool, dinv, Ltail, r):
        y = _run_fwd_inv(plan, pool, dinv, r)
        if tail is not None:
            _, tfwd, tbwd = tail
            y = tbwd(Ltail, tfwd(Ltail, y))
        return _run_bwd_inv(plan, pool, dinv, y, True, conj=hermitian)

    def fused(pool, dinv, arow, acol, avals, b, eps, itermax):
        R = b.shape[-1]
        bf = b.reshape(nbc * T, R)
        bnorm2 = jnp.maximum(jnp.sum(bf * bf), 1e-30)

        def spmv(x):
            xf = x.reshape(nbc * T, R)
            yf = jnp.zeros_like(bf)
            yf = yf.at[arow].add(avals[:, None] * xf[acol])
            return yf.reshape(nbc, T, R)

        Ltail = tail[0](pool) if tail is not None else None
        x = solve_once(pool, dinv, Ltail, b)
        r = b - spmv(x)

        def res2(rr):
            rf = rr.reshape(nbc * T, R)
            return jnp.sum(rf * rf)

        def cond(c):
            _, rr, prev2, it = c
            r2 = res2(rr)
            improving = r2 < 0.25 * prev2  # stop grinding at the fp32 floor
            return (r2 > eps * eps * bnorm2) & improving & (it < itermax)

        def body(c):
            x, rr, _, it = c
            x = x + solve_once(pool, dinv, Ltail, rr)
            return x, b - spmv(x), res2(rr), it + 1

        x, r, _, it = lax.while_loop(
            cond, body,
            (x, r, jnp.full((), np.inf, dtype=bnorm2.dtype), jnp.int32(0)),
        )
        return x, it, jnp.sqrt(res2(r) / bnorm2)

    return jax.jit(fused, static_argnames=())


def solve_inv(factors: Factors, b_perm: np.ndarray, solve_fn) -> np.ndarray:
    """Host driver for the fast (inverse-diag / sweep) solve programs."""
    layout = factors.layout
    # .dtype, NOT np.asarray(...).dtype (see run_fwd)
    bb = jnp.asarray(
        rhs_to_blocks(layout, b_perm, dtype=factors.pool.dtype)
    )
    if factors.kind == Factorization.LLT:
        xb = solve_fn(factors.pool, factors.dinv, bb)
    elif factors.kind in (Factorization.LDLT, Factorization.LDLH):
        xb = solve_fn(factors.pool, factors.dinv, factors.d, bb)
    else:
        xb = solve_fn(
            factors.pool, factors.pool_u, factors.dinv, factors.dinv_u, bb
        )
    out = blocks_to_rhs(layout, xb)
    return out if np.asarray(b_perm).ndim > 1 else out[:, 0]
