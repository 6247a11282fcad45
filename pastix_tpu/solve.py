"""Triangular solves (reference phase 5: updown / up_down_smp).

Level-batched forward/backward substitution over the same tile pool
(reference ``src/sopalin/src/updo.c`` — SURVEY.md section 2 row 13 and
call stack 3.4).  Where the reference exchanges RHS segments by MPI per
elimination level, here each level is one batched (T,T)x(T,R) matmul plus
a scatter-add — the whole sweep is a single jitted program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from pastix_tpu.analyze.layout import SolverLayout
from pastix_tpu.config import Factorization
from pastix_tpu.numeric.factorize import Factors
from jax import lax


def _tables(layout: SolverLayout):
    return [
        {
            "cols": jnp.asarray(lv.cols),
            "diag": jnp.asarray(lv.diag),
            "tp": jnp.asarray(lv.trsm_panel),
            "tr": jnp.asarray(lv.trsm_row),
            "tc": jnp.asarray(lv.trsm_col),
        }
        for lv in layout.levels
    ]


def build_solve_fn(layout: SolverLayout, kind: Factorization):
    """Jitted solve program: (pool[, pool_u][, d], y(nbc,T,R)) -> x.

    Signatures: LLT fn(pool, b); LDLT fn(pool, d, b); LU fn(pool, pool_u, b).
    """
    tab = _tables(layout)

    def fwd(pool, y, unit):
        for t in tab:
            sol = lax.linalg.triangular_solve(
                pool[t["diag"]], y[t["cols"]],
                left_side=True, lower=True, unit_diagonal=unit,
            )
            y = y.at[t["cols"]].set(sol)
            if t["tp"].size:
                contrib = jnp.einsum(
                    "bij,bjr->bir", pool[t["tp"]], y[t["tc"]],
                    preferred_element_type=y.dtype,
                    precision=jax.lax.Precision.HIGHEST,
                )
                y = y.at[t["tr"]].add(-contrib)
        return y

    def bwd_llt(pool, x):
        for t in reversed(tab):
            if t["tp"].size:
                contrib = jnp.einsum(
                    "bij,bir->bjr", pool[t["tp"]], x[t["tr"]],
                    preferred_element_type=x.dtype,
                    precision=jax.lax.Precision.HIGHEST,
                )
                x = x.at[t["tc"]].add(-contrib)
            sol = lax.linalg.triangular_solve(
                pool[t["diag"]], x[t["cols"]],
                left_side=True, lower=True, transpose_a=True,
            )
            x = x.at[t["cols"]].set(sol)
        return x

    def bwd_unit_lt(pool, x):
        for t in reversed(tab):
            if t["tp"].size:
                contrib = jnp.einsum(
                    "bij,bir->bjr", pool[t["tp"]], x[t["tr"]],
                    preferred_element_type=x.dtype,
                    precision=jax.lax.Precision.HIGHEST,
                )
                x = x.at[t["tc"]].add(-contrib)
            sol = lax.linalg.triangular_solve(
                pool[t["diag"]], x[t["cols"]],
                left_side=True, lower=True, transpose_a=True, unit_diagonal=True,
            )
            x = x.at[t["cols"]].set(sol)
        return x

    if kind == Factorization.LLT:

        def solve_llt(pool, b):
            return bwd_llt(pool, fwd(pool, b, unit=False))

        return jax.jit(solve_llt)

    if kind in (Factorization.LDLT, Factorization.LDLH):

        def solve_ldlt(pool, d, b):
            y = fwd(pool, b, unit=True)
            y = y / d[..., None]
            return bwd_unit_lt(pool, y)

        return jax.jit(solve_ldlt)

    if kind == Factorization.LU:

        def solve_lu(pool, pool_u, b):
            y = fwd(pool, b, unit=True)  # L is unit lower in combined tiles
            # backward with U: contributions via Ut tiles, diag via upper part
            x = y
            for t in reversed(tab):
                if t["tp"].size:
                    contrib = jnp.einsum(
                        "bij,bir->bjr", pool_u[t["tp"]], x[t["tr"]],
                        preferred_element_type=x.dtype,
                        precision=jax.lax.Precision.HIGHEST,
                    )
                    x = x.at[t["tc"]].add(-contrib)
                sol = lax.linalg.triangular_solve(
                    pool[t["diag"]], x[t["cols"]],
                    left_side=True, lower=False,
                )
                x = x.at[t["cols"]].set(sol)
            return x

        return jax.jit(solve_lu)

    raise ValueError(f"unsupported factorization: {kind}")


def build_fwd_bwd_fns(layout: SolverLayout, kind: Factorization):
    """Split jitted forward / backward sweeps (used by the Schur path:
    eliminate, dense-solve the Schur system, back-substitute)."""
    tab = _tables(layout)

    def fwd_generic(pool, y, unit):
        for t in tab:
            sol = lax.linalg.triangular_solve(
                pool[t["diag"]], y[t["cols"]],
                left_side=True, lower=True, unit_diagonal=unit,
            )
            y = y.at[t["cols"]].set(sol)
            if t["tp"].size:
                contrib = jnp.einsum(
                    "bij,bjr->bir", pool[t["tp"]], y[t["tc"]],
                    preferred_element_type=y.dtype,
                    precision=jax.lax.Precision.HIGHEST,
                )
                y = y.at[t["tr"]].add(-contrib)
        return y

    def bwd_generic(pool, x, transpose_lower, unit):
        for t in reversed(tab):
            if t["tp"].size:
                contrib = jnp.einsum(
                    "bij,bir->bjr", pool[t["tp"]], x[t["tr"]],
                    preferred_element_type=x.dtype,
                    precision=jax.lax.Precision.HIGHEST,
                )
                x = x.at[t["tc"]].add(-contrib)
            sol = lax.linalg.triangular_solve(
                pool[t["diag"]], x[t["cols"]],
                left_side=True, lower=transpose_lower,
                transpose_a=transpose_lower, unit_diagonal=unit,
            )
            x = x.at[t["cols"]].set(sol)
        return x

    if kind == Factorization.LLT:
        fwd = jax.jit(lambda pool, b: fwd_generic(pool, b, False))
        bwd = jax.jit(lambda pool, y: bwd_generic(pool, y, True, False))
    elif kind in (Factorization.LDLT, Factorization.LDLH):
        fwd = jax.jit(lambda pool, d, b: fwd_generic(pool, b, True) / d[..., None])
        bwd = jax.jit(lambda pool, d, y: bwd_generic(pool, y, True, True))
    else:  # LU

        def fwd_lu(pool, pool_u, b):
            return fwd_generic(pool, b, True)

        def bwd_lu(pool, pool_u, y):
            x = y
            for t in reversed(tab):
                if t["tp"].size:
                    contrib = jnp.einsum(
                        "bij,bir->bjr", pool_u[t["tp"]], x[t["tr"]],
                        preferred_element_type=x.dtype,
                        precision=jax.lax.Precision.HIGHEST,
                    )
                    x = x.at[t["tc"]].add(-contrib)
                sol = lax.linalg.triangular_solve(
                    pool[t["diag"]], x[t["cols"]],
                    left_side=True, lower=False,
                )
                x = x.at[t["cols"]].set(sol)
            return x

        fwd = jax.jit(fwd_lu)
        bwd = jax.jit(bwd_lu)
    return fwd, bwd


def _fn_args(factors: Factors):
    if factors.kind == Factorization.LLT:
        return (factors.pool,)
    if factors.kind in (Factorization.LDLT, Factorization.LDLH):
        return (factors.pool, factors.d)
    return (factors.pool, factors.pool_u)


def run_fwd(factors: Factors, b_perm: np.ndarray, fwd_fn) -> np.ndarray:
    layout = factors.layout
    bb = jnp.asarray(
        rhs_to_blocks(layout, b_perm, dtype=np.asarray(factors.pool).dtype)
    )
    yb = fwd_fn(*_fn_args(factors), bb)
    out = blocks_to_rhs(layout, yb)
    return out if np.asarray(b_perm).ndim > 1 else out[:, 0]


def run_bwd(factors: Factors, y_perm: np.ndarray, bwd_fn) -> np.ndarray:
    layout = factors.layout
    yb = jnp.asarray(
        rhs_to_blocks(layout, y_perm, dtype=np.asarray(factors.pool).dtype)
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
    bb = jnp.asarray(rhs_to_blocks(layout, b_perm, dtype=np.asarray(factors.pool).dtype))
    if factors.kind == Factorization.LLT:
        xb = fn(factors.pool, bb)
    elif factors.kind in (Factorization.LDLT, Factorization.LDLH):
        xb = fn(factors.pool, factors.d, bb)
    else:
        xb = fn(factors.pool, factors.pool_u, bb)
    out = blocks_to_rhs(layout, xb)
    return out if np.asarray(b_perm).ndim > 1 else out[:, 0]
