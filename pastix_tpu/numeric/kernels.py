"""Batched dense tile kernels (jnp/XLA reference path).

These are the task bodies of the reference's sopalin loop
(``src/sopalin/src/sopalin3d.c``: DIAG = dense panel factor with static
pivoting, E1 = panel TRSM, E2 = GEMM + scatter-add — SURVEY.md section 2
row 9), recast as *batched* operations over uniform T x T tiles so one
call per elimination level feeds the MXU.  A Pallas fused GEMM+scatter
path lives in pallas_kernels.py; this module is the portable XLA baseline
and the numerical reference.

All four reference precisions (s/d/c/z — the redefine_functions.h symbol
machinery) are one code path here, parameterized by dtype; ``hermitian``
selects conjugated transposes (API_SYM_HER / API_FACT_LDLTH) vs the plain
transposes of real and complex-symmetric factorizations.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


import os as _os

# MXU passes for fp32 matmuls: "highest" = 6-pass bf16 (exact-ish fp32),
# "high" = 3-pass (~1e-6 relative; refinement closes the gap — the default
# trade for a solver whose contract already includes refinement).
_PREC = {
    "high": lax.Precision.HIGH,
    "highest": lax.Precision.HIGHEST,
    "default": lax.Precision.DEFAULT,
}[_os.environ.get("PASTIX_MATMUL_PRECISION", "high")]


def matmul_precision():
    return _PREC


def _conj(x: jax.Array, hermitian: bool) -> jax.Array:
    return jnp.conj(x) if (hermitian and jnp.iscomplexobj(x)) else x


def _clamp_pivot(piv: jax.Array, eps: jax.Array):
    """Static pivoting: |piv| < eps -> clamp to eps along piv's phase.

    Reference DPARM_EPSILON_MAGN_CTRL semantics; returns (clamped, small).
    """
    if jnp.iscomplexobj(piv):
        mag = jnp.abs(piv)
        small = mag < eps
        unit = jnp.where(mag > 0, piv / jnp.where(mag > 0, mag, 1.0), 1.0 + 0.0j)
        return jnp.where(small, eps * unit, piv), small
    small = jnp.abs(piv) < eps
    return jnp.where(small, jnp.where(piv >= 0, eps, -eps), piv), small


# ---------------------------------------------------------------------------
# Diagonal-tile factorizations (the DIAG task)
# ---------------------------------------------------------------------------


def _potrf_sym_single(M: jax.Array) -> jax.Array:
    """Unconjugated Cholesky L L^T of one complex-*symmetric* tile.

    (lax.linalg.cholesky is Hermitian-only; reference API_SYM_YES with
    complex values factors A = L L^T with complex sqrt.)
    """
    T = M.shape[0]
    ar = lax.broadcasted_iota(jnp.int32, (T,), 0)

    def body(j, carry):
        M, L = carry
        piv = jnp.sqrt(M[j, j])
        col = M[:, j] / piv
        colm = jnp.where(ar > j, col, 0.0)
        M = M - colm[:, None] * colm[None, :]
        Lcol = jnp.where(ar == j, piv, jnp.where(ar > j, col, 0.0))
        L = L.at[:, j].set(Lcol)
        return M, L

    L0 = jnp.zeros_like(M)
    _, L = lax.fori_loop(0, T, body, (M, L0))
    return L


def potrf_batch(tiles: jax.Array, hermitian: bool = True) -> jax.Array:
    """Batched lower Cholesky of (B, T, T) tiles.

    hermitian=True: A = L L^H (real SPD / complex Hermitian, MXU path).
    hermitian=False with complex dtype: A = L L^T (complex symmetric).
    """
    if hermitian or not jnp.iscomplexobj(tiles):
        return lax.linalg.cholesky(tiles, symmetrize_input=False)
    return jax.vmap(_potrf_sym_single)(tiles)


def chol_inv_batch(tiles: jax.Array, hermitian: bool = True):
    """Batched Cholesky AND L^{-1} of (B, T, T) tiles in ONE serial loop.

    The per-level factorization critical path is latency-bound on small
    sequential loops, not flops (BASELINE.md section 4b): XLA expands
    ``lax.linalg.cholesky`` into a ~T-step column loop and the
    ``triangular_solve`` used to invert the diagonal tiles into another
    ~T-step loop.  This fused left-looking loop computes column j of L and
    row j of X = L^{-1} in the same step — halving the serial depth per
    elimination level (reference hot path: the DIAG task of sopalin_smp,
    src/sopalin/src/sopalin3d.c).

    Returns (L, Linv), both lower-triangular (B, T, T).
    """
    B, T, _ = tiles.shape
    herm = hermitian and jnp.iscomplexobj(tiles)
    ar = lax.broadcasted_iota(jnp.int32, (1, T), 1)

    def body(j, carry):
        L, X = carry
        Lrow = jnp.where(ar < j, L[:, j, :], 0.0)  # row j of L, cols < j
        # left-looking column j: col = A[:, j] - L[:, :j] @ op(L[j, :j])
        s = jnp.einsum(
            "bik,bk->bi", L, _conj(Lrow, herm), precision=_PREC,
            preferred_element_type=L.dtype,
        )
        col = tiles[:, :, j] - s
        pivsq = col[:, j]
        if herm:
            pivsq = jnp.real(pivsq).astype(tiles.dtype)
        piv = jnp.sqrt(pivsq)
        colm = jnp.where(ar > j, col / piv[:, None], 0.0)
        L = L.at[:, :, j].set(jnp.where(ar == j, piv[:, None], colm))
        # inverse row j: X[j, :] = (e_j - L[j, :j] @ X[:j, :]) / piv
        s2 = jnp.einsum(
            "bk,bkt->bt", Lrow, X, precision=_PREC,
            preferred_element_type=L.dtype,
        )
        ej = (ar == j).astype(L.dtype)
        X = X.at[:, j, :].set((ej - s2) / piv[:, None])
        return L, X

    zero = jnp.zeros_like(tiles)
    return lax.fori_loop(0, T, body, (zero, zero))


def _ldlt_single(M: jax.Array, eps: jax.Array, hermitian: bool):
    """Unpivoted LDL^T / LDL^H of one (T,T) tile with static pivoting.

    Returns (L_unit_lower, d, n_clamped).  Pivots with |d| < eps are
    clamped (DPARM_EPSILON_MAGN_CTRL semantics; count reported like
    IPARM_STATIC_PIVOTING).  For LDL^H the pivots are real.
    """
    T = M.shape[0]
    ar = lax.broadcasted_iota(jnp.int32, (T,), 0)
    herm = hermitian and jnp.iscomplexobj(M)

    def body(j, carry):
        M, L, d, npiv = carry
        piv = M[j, j]
        if herm:
            piv = jnp.real(piv).astype(M.dtype)  # Hermitian pivots are real
        pivc, small = _clamp_pivot(piv, eps)
        col = M[:, j] / pivc
        colm = jnp.where(ar > j, col, 0.0)
        row = jnp.conj(M[:, j]) if herm else M[j, :]
        rowm = jnp.where(ar > j, row, 0.0)
        M = M - colm[:, None] * rowm[None, :]
        Lcol = jnp.where(ar == j, 1.0, colm)
        L = L.at[:, j].set(Lcol)
        d = d.at[j].set(pivc)
        return M, L, d, npiv + small.astype(jnp.int32)

    L0 = jnp.zeros_like(M)
    d0 = jnp.zeros((T,), M.dtype)
    M, L, d, npiv = lax.fori_loop(0, T, body, (M, L0, d0, jnp.int32(0)))
    return L, d, npiv


def ldlt_batch(tiles: jax.Array, eps: jax.Array, hermitian: bool = False):
    """Batched LDL^T/LDL^H: (B,T,T) -> (L(B,T,T), d(B,T), npiv(B,))."""
    return jax.vmap(_ldlt_single, in_axes=(0, None, None))(
        tiles, eps, hermitian
    )


def ldlt_inv_batch(tiles: jax.Array, eps: jax.Array, hermitian: bool = False):
    """Batched LDL^T/LDL^H AND L^{-1} in ONE fused serial loop.

    Same latency rationale as :func:`chol_inv_batch`: the unit-lower
    inverse computed alongside the elimination turns the per-level panel
    TRSM into a pure MXU matmul without a second ~T-step expander loop.
    ``tiles`` must hold the full symmetric/Hermitian tile.
    Returns (L_unit_lower, d(B,T), Linv, npiv(B,)).
    """
    B, T, _ = tiles.shape
    herm = hermitian and jnp.iscomplexobj(tiles)
    ar = lax.broadcasted_iota(jnp.int32, (1, T), 1)

    def body(j, carry):
        M, L, d, X, npiv = carry
        piv = M[:, j, j]
        if herm:
            piv = jnp.real(piv).astype(M.dtype)
        pivc, small = _clamp_pivot(piv, eps)
        col = M[:, :, j] / pivc[:, None]
        colm = jnp.where(ar > j, col, 0.0)
        row = jnp.conj(M[:, :, j]) if herm else M[:, j, :]
        rowm = jnp.where(ar > j, row, 0.0)
        M = M - colm[:, :, None] * rowm[:, None, :]
        Lrow = jnp.where(ar < j, L[:, j, :], 0.0)
        L = L.at[:, :, j].set(jnp.where(ar == j, 1.0, colm))
        d = d.at[:, j].set(pivc)
        # inverse row j of the unit-lower factor: X[j,:] = e_j - L[j,:j] X
        s = jnp.einsum(
            "bk,bkt->bt", Lrow, X, precision=_PREC,
            preferred_element_type=L.dtype,
        )
        X = X.at[:, j, :].set((ar == j).astype(L.dtype) - s)
        return M, L, d, X, npiv + small.astype(jnp.int32)

    zero = jnp.zeros_like(tiles)
    d0 = jnp.zeros((B, T), tiles.dtype)
    _, L, d, X, npiv = lax.fori_loop(
        0, T, body, (tiles, zero, d0, zero, jnp.zeros((B,), jnp.int32))
    )
    return L, d, X, npiv


def _getrf_single(M: jax.Array, eps: jax.Array):
    """Unpivoted LU of one (T,T) tile with static pivoting.

    Returns (combined LU tile: unit L strictly below diag, U on/above;
    n_clamped).  This is the reference's API_FACT_LU numerics: *no* row
    exchanges, tiny pivots clamped (sopalin DIAG task for LU).
    """
    T = M.shape[0]
    ar = lax.broadcasted_iota(jnp.int32, (T,), 0)

    def body(j, carry):
        M, npiv = carry
        pivc, small = _clamp_pivot(M[j, j], eps)
        M = M.at[j, j].set(pivc)
        col = M[:, j] / pivc
        colm = jnp.where(ar > j, col, 0.0)
        rowm = jnp.where(ar > j, M[j, :], 0.0)
        M = M - colm[:, None] * rowm[None, :]
        M = M.at[:, j].set(jnp.where(ar > j, col, M[:, j]))
        return M, npiv + small.astype(jnp.int32)

    M, npiv = lax.fori_loop(0, T, body, (M, jnp.int32(0)))
    return M, npiv


def getrf_batch(tiles: jax.Array, eps: jax.Array):
    return jax.vmap(_getrf_single, in_axes=(0, None))(tiles, eps)


def getrf_inv_batch(tiles: jax.Array, eps: jax.Array):
    """Batched unpivoted LU AND both factor inverses in ONE serial loop.

    Replaces three ~T-step expander loops per elimination level (getrf +
    two triangular solves) with one: at step j the strictly-lower row
    L[j,:j] and the above-diagonal column U[:j,j] are final, so row j of
    Linv = L^{-1} (unit lower) and row j of Z = (U^T)^{-1} (so U^{-1} =
    Z^T) are computed in the same iteration.

    Returns (LU_combined, Linv, Z, npiv) with Z = U^{-T}, all (B, T, T).
    """
    B, T, _ = tiles.shape
    ar = lax.broadcasted_iota(jnp.int32, (1, T), 1)

    def body(j, carry):
        M, X, Z, npiv = carry
        pivc, small = _clamp_pivot(M[:, j, j], eps)
        Lrow = jnp.where(ar < j, M[:, j, :], 0.0)
        Ucol = jnp.where(ar < j, M[:, :, j], 0.0)
        ej = (ar == j).astype(M.dtype)
        # row j of Linv (unit lower) and of Z = U^{-T}
        sX = jnp.einsum(
            "bk,bkt->bt", Lrow, X, precision=_PREC,
            preferred_element_type=M.dtype,
        )
        X = X.at[:, j, :].set(ej - sX)
        sZ = jnp.einsum(
            "bk,bkt->bt", Ucol, Z, precision=_PREC,
            preferred_element_type=M.dtype,
        )
        Z = Z.at[:, j, :].set((ej - sZ) / pivc[:, None])
        # elimination step (right-looking, static pivoting)
        col = M[:, :, j] / pivc[:, None]
        colm = jnp.where(ar > j, col, 0.0)
        rowm = jnp.where(ar > j, M[:, j, :], 0.0)
        M = M - colm[:, :, None] * rowm[:, None, :]
        Mcol = jnp.where(ar > j, colm, jnp.where(ar == j, pivc[:, None], M[:, :, j]))
        M = M.at[:, :, j].set(Mcol)
        return M, X, Z, npiv + small.astype(jnp.int32)

    zero = jnp.zeros_like(tiles)
    M, X, Z, npiv = lax.fori_loop(
        0, T, body, (tiles, zero, zero, jnp.zeros((B,), jnp.int32))
    )
    return M, X, Z, npiv


# ---------------------------------------------------------------------------
# Panel TRSMs (the E1 task) — all right-side solves on (B, T, T)
# ---------------------------------------------------------------------------


def trsm_llt(panels: jax.Array, diags: jax.Array,
             hermitian: bool = True) -> jax.Array:
    """X @ op(Ljj)^T = A(I,J)  ->  L(I,J); op = conj for Hermitian."""
    return lax.linalg.triangular_solve(
        diags, panels, left_side=False, lower=True, transpose_a=True,
        conjugate_a=hermitian,
    )


def trsm_ldlt(panels: jax.Array, diags: jax.Array, d: jax.Array,
              hermitian: bool = False) -> jax.Array:
    """X @ (L D)^{T|H} = A(I,J): unit-L right-solve then column scale."""
    W = lax.linalg.triangular_solve(
        diags, panels, left_side=False, lower=True, transpose_a=True,
        conjugate_a=hermitian, unit_diagonal=True,
    )
    return W / d[:, None, :]


def trsm_lu_l(panels: jax.Array, diags: jax.Array) -> jax.Array:
    """L(I,J) = A(I,J) @ Ujj^{-1} (right-solve with the upper factor)."""
    return lax.linalg.triangular_solve(
        diags, panels, left_side=False, lower=False, transpose_a=False
    )


def trsm_lu_u(panels_t: jax.Array, diags: jax.Array) -> jax.Array:
    """Ut(I,J) = A(J,I)^T @ Ljj^{-T} (unit-lower right-solve, transposed)."""
    return lax.linalg.triangular_solve(
        diags, panels_t, left_side=False, lower=True, transpose_a=True,
        unit_diagonal=True,
    )


# ---------------------------------------------------------------------------
# Trailing updates (the E2 task): batched GEMM + scatter-add
# ---------------------------------------------------------------------------


# HBM guard: gathering a whole level's GEMM operands materializes
# (ng, T, T) temporaries; at 0.5-1M dof a single level can hold >100k
# triples (>10 GB of gathers).  Levels larger than this chunk run as a
# lax.scan over fixed-size chunks (padded with OOB indices: gather clamps,
# scatter drops), bounding the transient footprint to ~chunk * T^2 * 12 B
# while keeping the same math.  0 disables.
_GEMM_CHUNK = int(_os.environ.get("PASTIX_GEMM_CHUNK", "16384"))


def _pad_chunk(x: jax.Array, pad: int, fill) -> jax.Array:
    if not pad:
        return x
    return jnp.concatenate(
        [x, jnp.full((pad,) + x.shape[1:], fill, x.dtype)]
    )


def gemm_scatter(
    pool: jax.Array,
    ga: jax.Array,
    gb: jax.Array,
    gd: jax.Array,
    scale_cols: jax.Array | None = None,
    update_dtype=None,
    hermitian: bool = False,
    chunk: int | None = None,
) -> jax.Array:
    """pool[gd] -= pool[ga] @ op(pool[gb])^T, accumulated over duplicates.

    ``scale_cols`` (ng, T): per-triple column scaling (the D of LDL^T).
    ``update_dtype``: compute the GEMM in this dtype (bf16 trailing updates
    — the mixed-precision knob from BASELINE config 5).
    ``hermitian``: op = conj (LL^H / LDL^H trailing updates).
    """
    ng = ga.shape[0]
    if chunk is None:
        chunk = _GEMM_CHUNK
    if chunk and ng > chunk:
        npool = pool.shape[0]
        nc = -(-ng // chunk)
        pad = nc * chunk - ng
        xs = [
            _pad_chunk(ga, pad, npool).reshape(nc, chunk),
            _pad_chunk(gb, pad, npool).reshape(nc, chunk),
            _pad_chunk(gd, pad, npool).reshape(nc, chunk),
        ]
        if scale_cols is not None:
            xs.append(
                _pad_chunk(scale_cols, pad, 0).reshape(
                    nc, chunk, scale_cols.shape[1]
                )
            )

        def body(p, x):
            sc = x[3] if scale_cols is not None else None
            return (
                gemm_scatter(
                    p, x[0], x[1], x[2], scale_cols=sc,
                    update_dtype=update_dtype, hermitian=hermitian, chunk=0,
                ),
                None,
            )

        pool, _ = lax.scan(body, pool, tuple(xs))
        return pool
    a = pool[ga]
    b = _conj(pool[gb], hermitian)
    if scale_cols is not None:
        a = a * scale_cols[:, None, :]
    if update_dtype is not None:
        a = a.astype(update_dtype)
        b = b.astype(update_dtype)
    contrib = jnp.einsum(
        "bij,bkj->bik", a, b, preferred_element_type=pool.dtype,
        precision=_PREC,
    ).astype(pool.dtype)
    return pool.at[gd].add(-contrib)


def gemm_scatter_ab(
    dst_pool: jax.Array,
    a_pool: jax.Array,
    b_pool: jax.Array,
    ga: jax.Array,
    gb: jax.Array,
    gd: jax.Array,
    update_dtype=None,
    chunk: int | None = None,
) -> jax.Array:
    """dst_pool[gd] -= a_pool[ga] @ b_pool[gb]^T (the LU cross-pool update)."""
    ng = ga.shape[0]
    if chunk is None:
        chunk = _GEMM_CHUNK
    if chunk and ng > chunk:
        npool = dst_pool.shape[0]
        nc = -(-ng // chunk)
        pad = nc * chunk - ng
        xs = (
            _pad_chunk(ga, pad, npool).reshape(nc, chunk),
            _pad_chunk(gb, pad, npool).reshape(nc, chunk),
            _pad_chunk(gd, pad, npool).reshape(nc, chunk),
        )

        def body(p, x):
            return (
                gemm_scatter_ab(
                    p, a_pool, b_pool, x[0], x[1], x[2],
                    update_dtype=update_dtype, chunk=0,
                ),
                None,
            )

        dst_pool, _ = lax.scan(body, dst_pool, xs)
        return dst_pool
    a = a_pool[ga]
    b = b_pool[gb]
    if update_dtype is not None:
        a = a.astype(update_dtype)
        b = b.astype(update_dtype)
    contrib = jnp.einsum(
        "bij,bkj->bik", a, b, preferred_element_type=dst_pool.dtype,
        precision=_PREC,
    ).astype(dst_pool.dtype)
    return dst_pool.at[gd].add(-contrib)
