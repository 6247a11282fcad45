"""Numeric factorization drivers (reference phase 4: pastix_task_sopalin).

``coefinit`` fills the device tile pools from the permuted CSC values
(reference ``CoefMatrix_Init``, src/sopalin/src/coefinit.c) and
``build_factorize_fn`` emits one jitted program per sparsity pattern: an
unrolled loop over elimination levels, each level = batched DIAG factor +
batched TRSM + batched GEMM/scatter (replacing sopalin_smp's per-thread
static task queues — SURVEY.md section 3.3).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
import numpy as np
import scipy.sparse as sp

from pastix_tpu.analyze.layout import SolverLayout
from pastix_tpu.config import Factorization
from pastix_tpu.numeric import kernels as K


# ---------------------------------------------------------------------------
# coefinit
# ---------------------------------------------------------------------------


def coefinit(
    layout: SolverLayout,
    A_perm: sp.csc_matrix,
    dtype=np.float32,
    for_lu: bool = False,
):
    """Scatter permuted matrix values into the tile pool(s) (host-side).

    Returns (pool, pool_u) as numpy arrays; pool_u is None unless LU.
    Padded diagonal entries are set to 1 so the factorization of the
    embedding stays well-posed (the padded rows solve to x=b trivially).
    """
    T, nbc = layout.T, layout.nbc
    flat_len = layout.npool * T * T
    pool = np.zeros(flat_len, dtype=dtype)
    A = sp.coo_matrix(A_perm)
    i, j, v = A.row.astype(np.int64), A.col.astype(np.int64), A.data
    if for_lu:
        lo = (i // T) >= (j // T)  # tile on/below the block diagonal
        li, lj, lv = i[lo], j[lo], v[lo]
        p = layout.lookup(li // T, lj // T)
        np.add.at(pool, p * (T * T) + (li % T) * T + (lj % T), lv)
        ui, uj, uv = i[~lo], j[~lo], v[~lo]
        pool_u = np.zeros(flat_len, dtype=dtype)
        pu = layout.lookup(uj // T, ui // T)  # Ut(I,J) = A(J,I)^T
        np.add.at(pool_u, pu * (T * T) + (uj % T) * T + (ui % T), uv)
        pool_u[layout.diag_pad_flat] = 0.0
        pool_u = pool_u.reshape(layout.pool_shape)
    else:
        lo = i >= j  # lower triangle only (symmetric storage)
        li, lj, lv = i[lo], j[lo], v[lo]
        p = layout.lookup(li // T, lj // T)
        np.add.at(pool, p * (T * T) + (li % T) * T + (lj % T), lv)
        pool_u = None
    pool[layout.diag_pad_flat] = 1.0
    return pool.reshape(layout.pool_shape), pool_u


def build_coefinit_fn(
    layout: SolverLayout,
    A_pattern: sp.spmatrix,
    dtype=np.float32,
    for_lu: bool = False,
):
    """Device-side coefinit: jitted ``fn(vals) -> pool`` (or ``(pool,
    pool_u)`` for LU).

    Host prep computes the flat scatter indices once per pattern; each
    factorization then uploads only the nnz values (``A_perm.tocoo().data``
    cast to ``dtype``, in that COO order) instead of the zero-padded tile
    pool — orders of magnitude less host→device traffic on the
    pattern-reuse hot path (reference ``CoefMatrix_Init``,
    src/sopalin/src/coefinit.c, which fills coeftab in place for the same
    reason).  Entries outside the stored triangle get an out-of-bounds
    index, which JAX scatter drops — no per-call host masking.
    """
    import jax as _jax

    T = layout.T
    nrow = layout.npool * T  # 2D (npool*T, T) view: row index stays within
    # int32 even when npool*T*T overflows it (jnp silently downcasts int64
    # index tables to int32 without x64 — a flat index over a >2^31-element
    # pool wraps; hit at the 1M-dof flagship, pool 2.65e9 elements)
    assert nrow < np.iinfo(np.int32).max, "tile pool too large for int32 rows"
    A = sp.coo_matrix(A_pattern)
    i, j = A.row.astype(np.int64), A.col.astype(np.int64)
    OOB = nrow

    def _rc(sel, rows, cols):
        r = np.full(i.size, OOB, dtype=np.int64)
        c = np.zeros(i.size, dtype=np.int64)
        p = layout.lookup(rows[sel] // T, cols[sel] // T)
        r[sel] = p * T + rows[sel] % T
        c[sel] = cols[sel] % T
        return r.astype(np.int32), c.astype(np.int32)

    if for_lu:
        lo = (i // T) >= (j // T)  # tile on/below the block diagonal
        idx_l = _rc(lo, i, j)
        idx_u = _rc(~lo, j, i)  # Ut(I,J) = A(J,I)^T, stored transposed
    else:
        lo = i >= j  # lower triangle only (symmetric storage)
        idx_l = _rc(lo, i, j)
        idx_u = None
    pad_f = np.asarray(layout.diag_pad_flat)
    pad = ((pad_f // T).astype(np.int32), (pad_f % T).astype(np.int32))
    shape = layout.pool_shape

    def build_l(vals, idx, pad_idx):
        pool = jnp.zeros((nrow, T), dtype)
        pool = pool.at[idx].add(vals.astype(dtype))
        pool = pool.at[pad_idx].set(jnp.ones((), dtype))
        return pool.reshape(shape)

    if not for_lu:
        jfn = _jax.jit(build_l)
        tabs = _jax.device_put((idx_l, pad))
        fn = lambda vals: jfn(vals, *tabs)
        fn.dtype = np.dtype(dtype)  # baked pool dtype (validated by factorize)
        return fn

    def build_lu(vals, idx_l, idx_u, pad_idx):
        pool = build_l(vals, idx_l, pad_idx)
        pool_u = jnp.zeros((nrow, T), dtype)
        pool_u = pool_u.at[idx_u].add(vals.astype(dtype))
        return pool, pool_u.reshape(shape)

    jfn = _jax.jit(build_lu)
    tabs = _jax.device_put((idx_l, idx_u, pad))
    fn = lambda vals: jfn(vals, *tabs)
    fn.dtype = np.dtype(dtype)  # baked pool dtype (validated by factorize)
    return fn


# ---------------------------------------------------------------------------
# factorization programs
# ---------------------------------------------------------------------------


def _sym_lower(tiles: jax.Array, hermitian: bool = False) -> jax.Array:
    """Expand lower-stored diag tiles to full symmetric/Hermitian."""
    lo = jnp.tril(tiles)
    up = jnp.swapaxes(jnp.tril(tiles, -1), -1, -2)
    if hermitian and jnp.iscomplexobj(tiles):
        up = jnp.conj(up)
    return lo + up


@dataclasses.dataclass
class Factors:
    """Factorization result handle (device arrays + metadata)."""

    kind: Factorization
    layout: SolverLayout
    pool: jax.Array  # L (or combined LU diag) tiles
    pool_u: Optional[jax.Array]  # Ut tiles (LU only)
    d: Optional[jax.Array]  # (nbc, T) pivots (LDL^T only)
    n_static_pivots: int
    dinv: Optional[jax.Array] = None  # (nbc,T,T) inverse diag tiles (fast solve)
    dinv_u: Optional[jax.Array] = None  # LU: inverse upper diag tiles


import os as _os_mod

# HBM guard (matches kernels._GEMM_CHUNK): gathering a whole level's panel
# tiles for the TRSM matmul materializes (nt, T, T) temporaries — >5 GB on
# the widest levels at 0.5-1M dof.  Levels wider than this run the TRSM as
# a lax.scan over fixed chunks (pads: tp=npool -> gather clamps/scatter
# drops; tcpos/tc=0 -> junk operands on dropped writes).  0 disables.
_PANEL_CHUNK = int(_os_mod.environ.get("PASTIX_PANEL_CHUNK", "16384"))


def _scan_chunks(carry, tables, fills, body, chunk=None):
    """carry = body(carry, *tables) evaluated over bounded-size chunks."""
    if chunk is None:
        chunk = _PANEL_CHUNK
    ng = tables[0].shape[0]
    if not chunk or ng <= chunk:
        return body(carry, *tables)
    nc = -(-ng // chunk)
    pad = nc * chunk - ng
    xs = tuple(
        K._pad_chunk(a, pad, f).reshape((nc, chunk) + a.shape[1:])
        for a, f in zip(tables, fills)
    )

    def step(c, x):
        return body(c, *x), None

    carry, _ = lax.scan(step, carry, xs)
    return carry


def _unroll_tables(lv, use_pallas: bool = False, slab_ctx=None,
                   ll_inc=None, ll_ctx=None):
    t = {
        "cols": np.asarray(lv.cols),
        "diag": np.asarray(lv.diag),
        "tp": np.asarray(lv.trsm_panel),
        "td": np.asarray(lv.trsm_diag),
        "tc": np.asarray(lv.trsm_col),
        # panel's column position within this level (for fast TRSM)
        "tcpos": np.searchsorted(lv.cols, lv.trsm_col).astype(np.int32),
        "ga": np.asarray(lv.gemm_a),
        "gb": np.asarray(lv.gemm_b),
        "gd": np.asarray(lv.gemm_d),
        "gk": np.asarray(lv.gemm_k),
        "gnd": (np.flatnonzero(lv.gemm_nondiag).astype(np.int32)),
    }
    if ll_ctx is not None and ll_inc is not None and ll_inc[0].size:
        # left-looking incoming pass: all updates INTO this level's
        # columns, applied before its DIAG/TRSM (leftlook.py)
        from pastix_tpu.numeric.leftlook import build_ll_schedule

        ga_i, gb_i, gd_i, gk_i, nd_i = ll_inc
        t["p_in"] = build_ll_schedule(
            ga_i, gb_i, gd_i,
            gk=gk_i if ll_ctx.get("scaled") else None,
            group=ll_ctx["group"], cap=ll_ctx["cap"],
            mode=ll_ctx.get("mode", "auto"),
            rb=ll_ctx.get("rb"), T=ll_ctx.get("T", 128),
        )
        if ll_ctx.get("lu") and nd_i.any():
            t["p_in_nd"] = build_ll_schedule(
                ga_i[nd_i], gb_i[nd_i], gd_i[nd_i],
                group=ll_ctx["group"], cap=ll_ctx["cap"],
                mode=ll_ctx.get("mode", "auto"),
                rb=ll_ctx.get("rb"), T=ll_ctx.get("T", 128),
            )
    if use_pallas and lv.gemm_a.size:
        from pastix_tpu.numeric.pallas_kernels import build_pipeline_schedule

        # G=2 pairs per grid step measured fastest on v5e (5.93 vs 5.07
        # TF/s bf16 at G=1; G>=4 plateaus — exp_pipe.py round 3)
        grp = int(_os_mod.environ.get("PASTIX_E2_GROUP", "2"))
        if slab_ctx is not None and slab_ctx.get("mode") == "stream":
            # bf16 panel-stream: TRSM emits a compact half-width operand
            # array; the pair kernel reads it instead of the fp32 pool
            t["p_full"] = build_pipeline_schedule(
                lv.gemm_a, lv.gemm_b, lv.gemm_d, gk=lv.gemm_k, group=grp,
                ext_tiles=lv.trsm_panel,
            )
            nd_s = lv.gemm_nondiag
            if nd_s.any():
                t["p_nd"] = build_pipeline_schedule(
                    lv.gemm_a[nd_s], lv.gemm_b[nd_s], lv.gemm_d[nd_s],
                    group=grp, ext_tiles=lv.trsm_panel,
                )
            t["stream"] = np.int32(1)
        elif slab_ctx is not None and slab_ctx.get("mode") == "block":
            # dst-block schedule (byte-minimal blocked GEMM); entries
            # with poor slab economics fall back to the pair kernel
            from pastix_tpu.numeric.block_kernels import build_block_plan

            lay = slab_ctx["layout"]
            plan = build_block_plan(
                lv.gemm_a, lv.gemm_b, lv.gemm_d, lv.gemm_k,
                lay.blk_row, lay.blk_col, lay.keys, lay.nbc, lay.npool,
            )
            if plan.n_block_pairs:
                t["p_blk"] = plan
                fga, fgb, fgd, fgk = plan.fallback
                if fga.size:
                    t["p_fb"] = build_pipeline_schedule(
                        fga.astype(np.int32), fgb.astype(np.int32),
                        fgd.astype(np.int32), gk=fgk.astype(np.int32),
                        group=grp,
                    )
        elif slab_ctx is not None:
            # panel-slab schedule (descriptor-amortized, row-bounded);
            # short-panel pairs fall back to the pair kernel
            from pastix_tpu.numeric.slab_kernels import build_slab_plan

            plan = build_slab_plan(
                lv.gemm_a, lv.gemm_b, lv.gemm_d, lv.gemm_k,
                slab_ctx["diag_of_col"], slab_ctx["npool"],
                C=slab_ctx["C"], H=slab_ctx["H"], G=slab_ctx["G"],
                min_panel=slab_ctx["min_panel"],
                rbounds=slab_ctx["rbounds"], T=slab_ctx["T"],
            )
            if plan.n_slab_pairs:
                t["p_slab"] = plan
                fga, fgb, fgd, fgk = plan.fallback
                if fga.size:
                    t["p_fb"] = build_pipeline_schedule(
                        fga.astype(np.int32), fgb.astype(np.int32),
                        fgd.astype(np.int32), gk=fgk.astype(np.int32),
                        group=grp,
                    )
        if "p_slab" not in t and "p_blk" not in t and "p_full" not in t:
            t["p_full"] = build_pipeline_schedule(
                lv.gemm_a, lv.gemm_b, lv.gemm_d, gk=lv.gemm_k, group=grp
            )
        nd = lv.gemm_nondiag
        if nd.any() and slab_ctx is None:
            t["p_nd"] = build_pipeline_schedule(
                lv.gemm_a[nd], lv.gemm_b[nd], lv.gemm_d[nd], group=grp
            )
    return t


def _packed_unroll(pl, for_lu=False):
    """Packed-level fields for one unrolled level (pk_ prefix)."""
    t = {
        "pk_gidx": np.asarray(pl.gidx),
        "pk_cpos": np.asarray(pl.cpos),
        "pk_ccol": np.asarray(pl.ccol),
        "pk_pa": np.asarray(pl.pa),
        "pk_pgb": np.asarray(pl.pgb),
        "pk_dst": np.asarray(pl.dst),
    }
    if for_lu:
        t["pk_dst_u"] = np.asarray(pl.dst_u)
    return t


def _packed_scan(pls, nbc, npool, for_lu=False):
    """Stack a run of PackedLevels for lax.scan (pad chunks/pairs)."""
    maxc = max(pl.gidx.shape[0] for pl in pls)  # includes each pad chunk
    maxg = max(max(pl.pa.size for pl in pls), 1)
    T = pls[0].gidx.shape[1]
    OOB_ROW = npool * T

    def pad2(a, fill, m):
        out = np.full((m, T), fill, a.dtype)
        out[: a.shape[0]] = a
        return out

    def pad1(a, fill, m):
        out = np.full(m, fill, a.dtype)
        out[: a.size] = a
        return out

    g, cp, cc, pa, pgb, dst, dstu = [], [], [], [], [], [], []
    for pl in pls:
        g.append(pad2(pl.gidx, np.int32(OOB_ROW), maxc))
        cp.append(pad1(pl.cpos, 0, maxc))
        cc.append(pad1(pl.ccol, nbc, maxc))
        # pad pairs point at the last chunk (always a pad chunk) and
        # scatter out of bounds
        pa.append(pad1(pl.pa, maxc - 1, maxg))
        pgb.append(pad1(pl.pgb, npool, maxg))
        dst.append(pad2(pl.dst, np.int32(OOB_ROW), maxg))
        if for_lu:
            dstu.append(pad2(pl.dst_u, np.int32(OOB_ROW), maxg))
    t = {
        "pk_gidx": np.stack(g),
        "pk_cpos": np.stack(cp),
        "pk_ccol": np.stack(cc),
        "pk_pa": np.stack(pa),
        "pk_pgb": np.stack(pgb),
        "pk_dst": np.stack(dst),
    }
    if for_lu:
        t["pk_dst_u"] = np.stack(dstu)
    return t


def _scan_tables(g):
    # per-row searchsorted: cols/trsm_col are (nlev, m) stacks
    tcpos = np.stack(
        [
            np.searchsorted(c, tc).astype(np.int32)
            for c, tc in zip(g.cols, g.trsm_col)
        ]
    )
    # clamp padded entries (OOB columns) into range
    tcpos = np.minimum(tcpos, g.cols.shape[1] - 1).astype(np.int32)
    return {
        "cols": np.asarray(g.cols),
        "diag": np.asarray(g.diag),
        "tp": np.asarray(g.trsm_panel),
        "td": np.asarray(g.trsm_diag),
        "tc": np.asarray(g.trsm_col),
        "tcpos": tcpos,
        "ga": np.asarray(g.gemm_a),
        "gb": np.asarray(g.gemm_b),
        "gd": np.asarray(g.gemm_d),
        "gk": np.asarray(g.gemm_k),
        "gdo": np.asarray(g.gemm_d_offdiag),
    }


def _trsm_stream(pool, tp, tcpos, dinv, npool, T, stream_dtype,
                 d_arr=None, tc=None, nbc=None):
    """Panel TRSM that ALSO emits the level's post-TRSM panels as a
    compact half-width (bf16) array — the E2 operand stream.  The panels
    temp already exists as the TRSM einsum output, so the cast+store is
    the only extra traffic (~0.5 tile-write per panel tile vs the 2
    full-width reads per pair it saves — exp_dma r4: the E2 kernel is
    bytes-bound at ~240 GB/s)."""
    nt = int(tp.shape[0])
    chunk = _PANEL_CHUNK or nt

    if nt <= chunk:
        inv_p = dinv[tcpos]
        panels = jnp.einsum(
            "bij,bkj->bik", pool[tp], inv_p,
            preferred_element_type=pool.dtype,
            precision=K.matmul_precision(),
        )
        if d_arr is not None:
            panels = panels / d_arr[jnp.minimum(tc, nbc - 1)][:, None, :]
        return pool.at[tp].set(panels), panels.astype(stream_dtype)

    nc = -(-nt // chunk)
    pad = nc * chunk - nt
    tp_p = K._pad_chunk(tp, pad, npool).reshape(nc, chunk)
    tcp_p = K._pad_chunk(tcpos, pad, 0).reshape(nc, chunk)
    offs = jnp.arange(nc, dtype=jnp.int32) * jnp.int32(chunk)
    xs = [tp_p, tcp_p, offs]
    if d_arr is not None:
        xs.append(K._pad_chunk(tc, pad, 0).reshape(nc, chunk))
    xab0 = jnp.zeros((nc * chunk, T, T), stream_dtype)

    def step(carry, x):
        pool, xab = carry
        if d_arr is not None:
            tpc, tcc, off, tcc_col = x
        else:
            tpc, tcc, off = x
        inv_p = dinv[tcc]
        panels = jnp.einsum(
            "bij,bkj->bik", pool[tpc], inv_p,
            preferred_element_type=pool.dtype,
            precision=K.matmul_precision(),
        )
        if d_arr is not None:
            panels = panels / d_arr[jnp.minimum(tcc_col, nbc - 1)][
                :, None, :
            ]
        pool = pool.at[tpc].set(panels)
        xab = lax.dynamic_update_slice(
            xab, panels.astype(stream_dtype), (off, jnp.int32(0), jnp.int32(0))
        )
        return (pool, xab), None

    (pool, xab), _ = lax.scan(step, (pool, xab0), tuple(xs))
    return pool, xab


def build_factorize_fn(
    layout: SolverLayout,
    kind: Factorization,
    update_dtype=None,
    use_pallas: Optional[bool] = None,
    hermitian: Optional[bool] = None,
    donate: bool = False,
    dense_tail=None,
    packed_plan=None,
):
    """Emit the jitted factorization program for this pattern.

    Execution plan from :mod:`pastix_tpu.numeric.grouping`: flop-heavy
    levels are unrolled (maximal batches); the long tail of small levels
    (separator chains) runs as lax.scan over stacked padded tables —
    program size stays bounded as tree depth grows.

    ``use_pallas`` (default: ON for the TPU backend with T % 128 == 0;
    PASTIX_USE_PALLAS=0 disables) routes the unrolled levels' trailing
    updates through the pipelined Pallas gather-GEMM-scatter kernel
    (G=2 pairs per grid step, 5.9 vs 3.5 TF/s bf16 against XLA —
    BASELINE.md §4e); scan tails keep the XLA path.

    ``packed_plan`` (analyze.packed.build_packed_plan): route the panel
    TRSM + trailing updates through packed row supports — device flops
    track useful flops instead of tile-grid padding.  Complete real/complex
    factorizations only; must be built over the same ``levels`` list.

    Returned callable signatures:
      LLT : fn(pool)            -> pool'
      LDLT: fn(pool, eps)       -> (pool', d, npiv)
      LU  : fn(pool, pool_u, eps) -> (pool', pool_u', npiv)
    """
    from pastix_tpu.numeric.grouping import group_levels

    if hermitian is None:
        # conjugated transposes are the natural default: identical to plain
        # transposes for real dtypes, and the Hermitian (API_SYM_HER)
        # semantics for complex LLT/LDLH.  Complex-*symmetric* factorization
        # (API_SYM_YES with c/z values) passes hermitian=False explicitly.
        hermitian = kind in (Factorization.LLT, Factorization.LDLH)

    if use_pallas is None:
        # Mosaic DMA slices need the lane dim aligned to 128: the fused
        # kernel requires T % 128 == 0.  Default ON for TPU since round 3:
        # the pipelined kernel (double-buffered DMAs, dst-prefetched VMEM
        # accumulators) measures 1.5x the XLA gather-GEMM-scatter
        # (5.2 vs 3.5 TF/s bf16, exp_pipe.py).  PASTIX_USE_PALLAS=0
        # disables.
        import os as _os

        use_pallas = (
            _os.environ.get("PASTIX_USE_PALLAS", "1") != "0"
            and jax.default_backend() == "tpu"
            and layout.T % 128 == 0
        )
    if use_pallas:
        from pastix_tpu.numeric.pallas_kernels import gemm_scatter_pipelined
        from pastix_tpu.numeric.slab_kernels import gemm_scatter_slab
        from pastix_tpu.numeric.block_kernels import gemm_scatter_block
        from pastix_tpu.numeric.leftlook import gemm_scatter_ll

    # byte-efficient E2 schedules (LLT/LDLT real dtypes):
    #   PASTIX_E2_BLOCK=1 (default): dst-block blocked GEMM
    #     (block_kernels.py) — per-entry cost gate, pair-kernel fallback
    #   PASTIX_E2_SLAB=1 + PASTIX_E2_BLOCK=0: panel-slab schedule
    #   both 0: per-pair pipelined kernel everywhere
    # Left-looking E2 (round 5, leftlook.py): the byte model located the
    # E2 wall in per-source-level dst RMWs (217 GB at the flagship);
    # regrouping updates at their TARGET level cuts dst traffic ~14x and
    # makes segment-grouped MXU dots + the b-side VMEM operand cache pay.
    # Default ON for the pallas path; PASTIX_E2_LL=0 reverts to the
    # round-4 right-looking stream kernel.
    use_ll = (
        use_pallas
        and update_dtype is not None
        and packed_plan is None
        and kind in (Factorization.LLT, Factorization.LDLT,
                     Factorization.LU)
        and _os_mod.environ.get("PASTIX_E2_LL", "1") != "0"
    )

    slab_ctx = None
    # default ON since round 4: flagship 1824 -> 1609 ms (residual
    # identical); PASTIX_E2_STREAM=0 reverts to pool-read operands
    use_stream = _os_mod.environ.get("PASTIX_E2_STREAM", "1") != "0"
    use_block = _os_mod.environ.get("PASTIX_E2_BLOCK", "1") != "0"
    if use_ll:
        use_stream = use_block = False
    if (
        not use_ll
        and use_pallas
        and (
            kind in (Factorization.LLT, Factorization.LDLT)
            or (kind == Factorization.LU and use_stream)
        )
        and (
            use_stream
            or use_block
            or _os_mod.environ.get("PASTIX_E2_SLAB", "1") != "0"
        )
    ):
        diag_of_col_np = np.asarray(
            layout.lookup(np.arange(layout.nbc), np.arange(layout.nbc))
        )
        rbounds = None
        if (
            layout.row_lo is not None
            and _os_mod.environ.get("PASTIX_SLAB_BOUND", "1") != "0"
        ):
            rbounds = (layout.row_lo, layout.row_hi)
        slab_ctx = {
            "mode": "stream" if use_stream else (
                "block" if use_block else "slab"
            ),
            "layout": layout,
            "diag_of_col": diag_of_col_np,
            "npool": layout.npool,
            "rbounds": rbounds,
            "T": layout.T,
            # 0 = per-level auto (C from the level's panel lengths, H=4C)
            "C": int(_os_mod.environ.get("PASTIX_SLAB_C", "0")),
            "H": int(_os_mod.environ.get("PASTIX_SLAB_H", "0")),
            "G": int(_os_mod.environ.get("PASTIX_SLAB_G", "4")),
            "min_panel": int(
                _os_mod.environ.get("PASTIX_SLAB_MINPANEL", "6")
            ),
        }

    # dense terminal block (analyze/layout.plan_dense_tail): supported for
    # LLT with hermitian/real semantics (lax.linalg.cholesky); other kinds
    # keep the per-tile-column level chain for now
    if dense_tail is not None and not (
        kind == Factorization.LLT and hermitian
    ):
        dense_tail = None
    levels = dense_tail.levels_lo if dense_tail is not None else layout.levels

    packed = packed_plan is not None
    if packed:
        assert len(packed_plan.levels) == len(levels), (
            "packed plan must be built over the same level list"
        )
        use_pallas = False

    from pastix_tpu.numeric.grouping import group_plan, _stack_levels

    is_lu = kind == Factorization.LU

    # --- left-looking regroup (leftlook.regroup_left) -------------------
    ll_ctx = None
    ll_incoming = None
    p_tail = None
    if use_ll:
        from pastix_tpu.numeric.leftlook import (
            build_ll_schedule, regroup_left,
        )

        # plan unroll/scan on INCOMING-inflated sizes: the top levels
        # have small outgoing but large incoming update lists, and scan
        # bodies cannot host per-level static pallas schedules
        ncol_ll = int(layout.nbc)
        col2li = np.full(ncol_ll, -1, np.int64)
        for li_, lv_ in enumerate(levels):
            col2li[lv_.cols] = li_
        inc_n = np.zeros(len(levels), np.int64)
        for lv_ in levels:
            if lv_.gemm_d.size == 0:
                continue
            tcol = layout.blk_col[lv_.gemm_d]
            m_ = (
                tcol < dense_tail.s if dense_tail is not None
                else np.ones(tcol.size, bool)
            )
            tli = col2li[tcol[m_]]
            np.add.at(inc_n, tli[tli >= 0], 1)

        class _SizeShim:
            __slots__ = ("gemm_a", "trsm_panel", "diag")

            class _N:
                __slots__ = ("size",)

                def __init__(self, n):
                    self.size = n

            def __init__(self, g, t_, d_):
                self.gemm_a = self._N(g)
                self.trsm_panel = self._N(t_)
                self.diag = self._N(d_)

        shims = [
            _SizeShim(int(lv_.gemm_a.size + inc_n[i_]),
                      int(lv_.trsm_panel.size), int(lv_.diag.size))
            for i_, lv_ in enumerate(levels)
        ]
        gplan = group_plan(shims, T=layout.T)
        unrolled_set = {i_ for tag_, i_ in gplan if tag_ == "unroll"}
        levels, ll_incoming, ll_tail = regroup_left(
            levels, layout.blk_col,
            dense_tail.s if dense_tail is not None else None,
            unrolled_set,
        )
        # row-bounded dots (splitpart analog): a pair's contribution has
        # nonzero rows only in its a tile's scalar row support — pass the
        # per-tile bounds so build_ll_schedule classes pairs by quantized
        # height and the kernel runs (H, T) x (T, T) dots
        _rb = None
        if (
            layout.row_lo is not None
            and _os_mod.environ.get("PASTIX_E2_ROWB", "1") != "0"
        ):
            _rb = (layout.row_lo, layout.row_hi)
        ll_ctx = {
            "group": int(_os_mod.environ.get("PASTIX_LL_GROUP", "4")),
            "cap": int(_os_mod.environ.get("PASTIX_LL_CAP", "1024")),
            "mode": _os_mod.environ.get("PASTIX_LL_MODE", "auto"),
            "scaled": kind in (Factorization.LDLT, Factorization.LDLH),
            "lu": is_lu,
            "rb": _rb,
            "T": layout.T,
        }
        if ll_tail is not None and ll_tail[0].size:
            # dense-tail pre-pass: every update targeting a tail tile,
            # applied once before tail_factor (the a/b-reuse here is the
            # highest in the whole plan: ~83 pairs per dst tile)
            p_tail = build_ll_schedule(
                ll_tail[0], ll_tail[1], ll_tail[2],
                group=ll_ctx["group"], cap=ll_ctx["cap"],
                rb=ll_ctx["rb"], T=layout.T,
                # measured at the flagship: the tail list's per-chunk
                # a-uniq density is poor (~2 ops/pair even at cap 1792),
                # so the fp32 per-pair a-DMA beats caching both sides
                mode=_os_mod.environ.get("PASTIX_LL_TAIL_MODE", "bcache"),
            )
    else:
        gplan = group_plan(levels, T=layout.T)

    plan = []
    for tag, item in gplan:
        if tag == "unroll":
            t = _unroll_tables(
                levels[item], use_pallas, slab_ctx,
                ll_inc=ll_incoming[item] if ll_incoming else None,
                ll_ctx=ll_ctx,
            )
            if packed:
                t.update(_packed_unroll(packed_plan.levels[item], is_lu))
        else:
            t = _scan_tables(
                _stack_levels([levels[i] for i in item], layout.npool, layout.nbc)
            )
            if packed:
                t.update(
                    _packed_scan(
                        [packed_plan.levels[i] for i in item],
                        layout.nbc, layout.npool, is_lu,
                    )
                )
        if packed:
            # the grid-tile TRSM/GEMM tables are unused on the packed path
            for k in ("tp", "td", "tc", "tcpos", "ga", "gb", "gd", "gk",
                      "gnd", "gdo"):
                t.pop(k, None)
        plan.append((tag, t))
    nbc, T = layout.nbc, layout.T
    npool = layout.npool
    if packed:

        def packed_scatter(p2, W, dst):
            # row-granular extend-add: each W row is a full (T,) lane row of
            # one target tile (element scatter measured ~8x slower on TPU);
            # dst is a host-precomputed (ng, T) table, OOB rows drop
            return p2.at[dst].add(-W)

        def packed_gemm(a, b):
            if update_dtype is not None:
                a = a.astype(update_dtype)
                b = b.astype(update_dtype)
            return jnp.einsum(
                "gij,gkj->gik", a, b,
                preferred_element_type=jnp.promote_types(a.dtype, jnp.float32)
                if not jnp.iscomplexobj(a) else a.dtype,
                precision=K.matmul_precision(),
            )

    # The index tables are passed as ARGUMENTS (uploaded to the device once
    # here), not closed over: numpy closures become HLO constants, and at
    # 1M-dof scale hundreds of MB of embedded constants break the compiler.
    # The Pallas tables (p_full/p_nd) stay host-static: the fused kernel's
    # grid metadata needs concrete values.
    # device flops actually saved by the slab kernel's row-bounded
    # sub-matmuls vs the full-tile count (layout.padded_flops); consumers
    # read fn.e2_saved_flops for honest padded/useful reporting
    e2_saved = 0.0
    for _tag, _t in plan:
        for _k in ("p_in", "p_in_nd"):
            for _c in _t.get(_k, ()):  # LL row-bounded classes
                _H = _c.get("H", layout.T)
                e2_saved += (
                    _c["n_real"] * (layout.T - _H) * 2.0 * layout.T ** 2
                )
        if "p_slab" in _t:
            st = _t["p_slab"].stats
            e2_saved += (
                st["pairs_slab"] * (1.0 - st["flop_frac"])
                * 2.0 * layout.T ** 3
            )
        if "p_blk" in _t:
            # block entries execute ha_cls x hb_cls full class dots;
            # savings can be NEGATIVE (class padding) vs per-pair count
            st = _t["p_blk"].stats
            e2_saved += (
                st["pairs_blk"] - st["exec_tile_products"]
            ) * 2.0 * layout.T ** 3

    if p_tail is not None:
        for _c in p_tail:
            _H = _c.get("H", layout.T)
            e2_saved += _c["n_real"] * (layout.T - _H) * 2.0 * layout.T ** 2

    plan_tags = [tag for tag, _ in plan]
    _static_keys = ("p_full", "p_nd", "p_slab", "p_blk", "p_fb",
                    "p_in", "p_in_nd")
    plan_static = [
        {k: t[k] for k in _static_keys if k in t} for _, t in plan
    ]
    plan_tables = jax.device_put(
        [
            {k: v for k, v in t.items() if k not in _static_keys}
            for _, t in plan
        ]
    )

    def plan_iter(tables):
        return (
            (tag, {**t, **st})
            for tag, t, st in zip(plan_tags, tables, plan_static)
        )

    jit_opts = {}
    if use_ll and jax.default_backend() == "tpu":
        # the LL kernel's VMEM operand cache (cap tiles x 32 KB bf16)
        # exceeds XLA's default 16 MiB scoped-vmem budget; the v5e has
        # 128 MiB — raise the limit for this program only
        jit_opts["compiler_options"] = {
            "xla_tpu_scoped_vmem_limit_kib": int(
                _os_mod.environ.get("PASTIX_VMEM_KIB", "65536")
            )
        }

    if dense_tail is not None:
        t_p = np.asarray(dense_tail.p_idx)
        t_qi = np.asarray(dense_tail.qi)
        t_qj = np.asarray(dense_tail.qj)
        tq = dense_tail.q

        import os as _os_tail

        tail_mode = _os_tail.environ.get("PASTIX_TAIL", "blocked")

        def tail_factor_xla(dense):
            return lax.linalg.cholesky(
                dense.reshape(tq * T, tq * T), symmetrize_input=False
            ).reshape(tq, T, tq, T)

        def tail_factor_blocked(A):
            # right-looking blocked Cholesky over the (q,T,q,T) tile grid,
            # statically unrolled: the fused chol+inverse kernel factors
            # each diagonal block in one ~T-step loop (vs the XLA
            # expander's chol + triangular-solve loops) and the panel/
            # trailing updates are plain static-shape MXU matmuls.
            # Trailing updates honor update_dtype (bf16 mixed precision),
            # which lax.linalg.cholesky cannot.  Upper blocks accumulate
            # the symmetric mirror; only lower blocks are read back.
            for j in range(tq):
                Lj, Li = K.chol_inv_batch(
                    jnp.tril(A[j, :, j, :])[None], hermitian=hermitian
                )
                A = A.at[j, :, j, :].set(Lj[0])
                if j + 1 == tq:
                    break
                cols = A[j + 1:, :, j, :]
                inv = jnp.conj(Li[0]) if (
                    hermitian and jnp.iscomplexobj(A)
                ) else Li[0]
                P = jnp.einsum(
                    "rit,kt->rik", cols, inv,
                    preferred_element_type=A.dtype,
                    precision=K.matmul_precision(),
                )
                A = A.at[j + 1:, :, j, :].set(P)
                Pa = P.astype(update_dtype) if update_dtype else P
                Pb = _conj_tail(Pa)
                contrib = jnp.einsum(
                    "aik,blk->aibl", Pa, Pb,
                    preferred_element_type=A.dtype,
                    precision=K.matmul_precision(),
                ).astype(A.dtype)
                A = A.at[j + 1:, :, j + 1:, :].add(-contrib)
            return A

        def _conj_tail(x):
            return jnp.conj(x) if (hermitian and jnp.iscomplexobj(x)) else x

        def tail_factor(pool):
            # gather the trailing Schur complement into one dense tile grid
            # (missing upper tiles stay zero; only lower is read), factor,
            # scatter the lower blocks back
            tiles = pool[t_p]
            dense = jnp.zeros((tq, T, tq, T), pool.dtype)
            dense = dense.at[t_qi, :, t_qj, :].set(tiles)
            L = (
                tail_factor_blocked(dense)
                if tail_mode == "blocked"
                else tail_factor_xla(dense)
            )
            return pool.at[t_p].set(L[t_qi, :, t_qj, :])

    if kind == Factorization.LLT:

        import os as _os

        # Fused chol+inverse measured SLOWER than XLA's blocked expanders
        # on the v5e at both the unrolled levels and the scan tail
        # (BASELINE.md §4b A/B): the fused loop's per-step full-array
        # reads cost more than the saved serial steps.  Default off;
        # PASTIX_FUSED_DIAG=1|unroll|scan re-enables for re-measurement.
        _f = _os.environ.get("PASTIX_FUSED_DIAG", "0")
        fused_unroll = _f in ("1", "unroll")
        fused_scan = _f in ("1", "scan")

        def llt_level(pool, t, fused_diag):
            if "p_in" in t and not jnp.iscomplexobj(pool):
                # left-looking: apply every update INTO this level first
                pool = gemm_scatter_ll(
                    pool, t["p_in"], update_dtype=update_dtype
                )
            if t["tp"].size and fused_diag:
                # fused DIAG factor + tile inverse: ONE ~T-step serial loop
                # per level instead of two (cholesky expander + triangular-
                # solve expander) — the per-level latency bottleneck
                diag, dinv = K.chol_inv_batch(
                    jnp.tril(pool[t["diag"]]), hermitian=hermitian
                )
            else:
                diag = K.potrf_batch(
                    jnp.tril(pool[t["diag"]]), hermitian=hermitian
                )
            pool = pool.at[t["diag"]].set(diag)
            if t["tp"].size:
                if not fused_diag:
                    eye = jnp.broadcast_to(
                        jnp.eye(T, dtype=pool.dtype),
                        (t["diag"].shape[0], T, T),
                    )
                    dinv = lax.linalg.triangular_solve(
                        diag, eye, left_side=True, lower=True
                    )
                # panel TRSM as a matmul with the level's inverted diagonals
                # (the nt-batch triangular loop becomes an MXU gemm)
                def trsm_body(pool, tp, tcpos):
                    inv_p = dinv[tcpos]
                    if hermitian and jnp.iscomplexobj(pool):
                        inv_p = jnp.conj(inv_p)
                    panels = jnp.einsum(
                        "bij,bkj->bik", pool[tp], inv_p,
                        preferred_element_type=pool.dtype,
                        precision=K.matmul_precision(),
                    )
                    return pool.at[tp].set(panels)

                if (
                    "stream" in t
                    and "p_full" in t
                    and update_dtype is not None
                    and not jnp.iscomplexobj(pool)
                ):
                    pool, xab = _trsm_stream(
                        pool, t["tp"], t["tcpos"], dinv, npool, T,
                        update_dtype,
                    )
                    pool = gemm_scatter_pipelined(
                        pool, t["p_full"], update_dtype=update_dtype,
                        xab=xab,
                    )
                    return pool
                pool = _scan_chunks(
                    pool, (t["tp"], t["tcpos"]), (npool, 0), trsm_body
                )
            if "p_blk" in t and not jnp.iscomplexobj(pool):
                pool = gemm_scatter_block(
                    pool, t["p_blk"], update_dtype=update_dtype
                )
                if "p_fb" in t:
                    pool = gemm_scatter_pipelined(
                        pool, t["p_fb"], update_dtype=update_dtype
                    )
            elif "p_slab" in t and not jnp.iscomplexobj(pool):
                pool = gemm_scatter_slab(
                    pool, t["p_slab"], update_dtype=update_dtype
                )
                if "p_fb" in t:
                    pool = gemm_scatter_pipelined(
                        pool, t["p_fb"], update_dtype=update_dtype
                    )
            elif "p_full" in t and not jnp.iscomplexobj(pool):
                pool = gemm_scatter_pipelined(
                    pool, t["p_full"], update_dtype=update_dtype
                )
            elif t["ga"].size:
                pool = K.gemm_scatter(
                    pool, t["ga"], t["gb"], t["gd"], update_dtype=update_dtype,
                    hermitian=hermitian,
                )
            return pool

        def llt_level_packed(pool, t):
            has_chunks = t["pk_pa"].shape[-1] > 0 or t["pk_gidx"].shape[-2] > 1
            diag = K.potrf_batch(
                jnp.tril(pool[t["diag"]]), hermitian=hermitian
            )
            if has_chunks:
                eye = jnp.broadcast_to(
                    jnp.eye(T, dtype=pool.dtype),
                    (t["diag"].shape[-1], T, T),
                )
                dinv = lax.linalg.triangular_solve(
                    diag, eye, left_side=True, lower=True
                )
            pool = pool.at[t["diag"]].set(diag)
            if not has_chunks:
                return pool
            p2 = pool.reshape(npool * T, T)
            P = p2[t["pk_gidx"]]  # (nc, T, T) packed pre-TRSM rows
            inv_c = dinv[t["pk_cpos"]]
            if hermitian and jnp.iscomplexobj(pool):
                inv_c = jnp.conj(inv_c)
            O = jnp.einsum(
                "cij,ckj->cik", P, inv_c,
                preferred_element_type=pool.dtype,
                precision=K.matmul_precision(),
            )
            p2 = p2.at[t["pk_gidx"]].set(O)
            if t["pk_pa"].shape[-1]:
                pa = t["pk_pa"]
                # b operand from the grid (post-TRSM panel tile): its
                # off-support rows are structurally zero -> zero W columns
                b = p2.reshape(npool, T, T)[t["pk_pgb"]]
                if hermitian and jnp.iscomplexobj(pool):
                    b = jnp.conj(b)
                W = packed_gemm(O[pa], b).astype(pool.dtype)
                p2 = packed_scatter(p2, W, t["pk_dst"])
            return p2.reshape(pool.shape)

        def fact_llt(pool, tables):
            for tag, t in plan_iter(tables):
                if packed:
                    if tag == "unroll":
                        pool = llt_level_packed(pool, t)
                    else:

                        def body(pool, x):
                            return llt_level_packed(pool, x), None

                        pool, _ = lax.scan(body, pool, t)
                elif tag == "unroll":
                    pool = llt_level(pool, t, fused_unroll)
                else:

                    def body(pool, x):
                        return llt_level(pool, x, fused_scan), None

                    pool, _ = lax.scan(body, pool, t)
            if p_tail is not None and not jnp.iscomplexobj(pool):
                # dense-tail pre-pass: all updates into tail tiles, once
                pool = gemm_scatter_ll(
                    pool, p_tail, update_dtype=update_dtype
                )
            if dense_tail is not None:
                pool = tail_factor(pool)
            return pool

        jfn = jax.jit(fact_llt, donate_argnums=(0,) if donate else (),
                      **jit_opts)
        fn = lambda pool: jfn(pool, plan_tables)
        fn.e2_saved_flops = e2_saved
        return fn

    if kind in (Factorization.LDLT, Factorization.LDLH):

        def ldlt_level(carry, t):
            pool, d_arr, npiv = carry
            if "p_in" in t and not jnp.iscomplexobj(pool):
                # left-looking incoming pass; a-columns scaled by the
                # source columns' pivots (all from earlier levels)
                pool = gemm_scatter_ll(
                    pool, t["p_in"], d=d_arr, update_dtype=update_dtype
                )
            if t["tp"].size:
                # fused DIAG factor + unit-L inverse (one serial loop/level)
                L, d, dinv, piv = K.ldlt_inv_batch(
                    _sym_lower(pool[t["diag"]], hermitian), t["eps"], hermitian
                )
            else:
                L, d, piv = K.ldlt_batch(
                    _sym_lower(pool[t["diag"]], hermitian), t["eps"], hermitian
                )
            pool = pool.at[t["diag"]].set(L)
            d_arr = d_arr.at[t["cols"]].set(d)
            valid = t["cols"] < nbc
            npiv = npiv + jnp.where(valid, piv, 0).sum(dtype=jnp.int32)
            if t["tp"].size:
                # panel TRSM as an MXU matmul: L(I,J) = A(I,J) L^{-H} D^{-1}
                def trsm_body(pool, tp, tcpos, tc):
                    inv_p = dinv[tcpos]
                    if hermitian and jnp.iscomplexobj(pool):
                        inv_p = jnp.conj(inv_p)
                    panels = jnp.einsum(
                        "bij,bkj->bik", pool[tp], inv_p,
                        preferred_element_type=pool.dtype,
                        precision=K.matmul_precision(),
                    ) / d_arr[jnp.minimum(tc, nbc - 1)][:, None, :]
                    return pool.at[tp].set(panels)

                if (
                    "stream" in t
                    and "p_full" in t
                    and update_dtype is not None
                    and not jnp.iscomplexobj(pool)
                ):
                    pool, xab = _trsm_stream(
                        pool, t["tp"], t["tcpos"], dinv, npool, T,
                        update_dtype, d_arr=d_arr, tc=t["tc"], nbc=nbc,
                    )
                    pool = gemm_scatter_pipelined(
                        pool, t["p_full"], d=d_arr,
                        update_dtype=update_dtype, xab=xab,
                    )
                    return pool, d_arr, npiv
                pool = _scan_chunks(
                    pool, (t["tp"], t["tcpos"], t["tc"]), (npool, 0, 0),
                    trsm_body,
                )
            if "p_blk" in t and not jnp.iscomplexobj(pool):
                pool = gemm_scatter_block(
                    pool, t["p_blk"], d=d_arr, update_dtype=update_dtype
                )
                if "p_fb" in t:
                    pool = gemm_scatter_pipelined(
                        pool, t["p_fb"], d=d_arr, update_dtype=update_dtype
                    )
            elif "p_slab" in t and not jnp.iscomplexobj(pool):
                pool = gemm_scatter_slab(
                    pool, t["p_slab"], d=d_arr, update_dtype=update_dtype
                )
                if "p_fb" in t:
                    pool = gemm_scatter_pipelined(
                        pool, t["p_fb"], d=d_arr, update_dtype=update_dtype
                    )
            elif "p_full" in t and not jnp.iscomplexobj(pool):
                pool = gemm_scatter_pipelined(
                    pool, t["p_full"], d=d_arr, update_dtype=update_dtype
                )
            elif t["ga"].size:
                pool = K.gemm_scatter(
                    pool, t["ga"], t["gb"], t["gd"],
                    scale_cols=d_arr[t["gk"]], update_dtype=update_dtype,
                    hermitian=hermitian,
                )
            return pool, d_arr, npiv

        def ldlt_level_packed(carry, t):
            pool, d_arr, npiv = carry
            has_chunks = t["pk_pa"].shape[-1] > 0 or t["pk_gidx"].shape[-2] > 1
            if has_chunks:
                L, d, dinv, piv = K.ldlt_inv_batch(
                    _sym_lower(pool[t["diag"]], hermitian), t["eps"], hermitian
                )
            else:
                L, d, piv = K.ldlt_batch(
                    _sym_lower(pool[t["diag"]], hermitian), t["eps"], hermitian
                )
            pool = pool.at[t["diag"]].set(L)
            d_arr = d_arr.at[t["cols"]].set(d)
            valid = t["cols"] < nbc
            npiv = npiv + jnp.where(valid, piv, 0).sum(dtype=jnp.int32)
            if not has_chunks:
                return pool, d_arr, npiv
            p2 = pool.reshape(npool * T, T)
            P = p2[t["pk_gidx"]]
            inv_c = dinv[t["pk_cpos"]]
            if hermitian and jnp.iscomplexobj(pool):
                inv_c = jnp.conj(inv_c)
            dcol = d_arr[t["pk_ccol"]]  # (nc, T) pivots of the chunk's column
            O = jnp.einsum(
                "cij,ckj->cik", P, inv_c,
                preferred_element_type=pool.dtype,
                precision=K.matmul_precision(),
            ) / dcol[:, None, :]
            p2 = p2.at[t["pk_gidx"]].set(O)
            if t["pk_pa"].shape[-1]:
                pa = t["pk_pa"]
                a = O[pa] * dcol[pa][:, None, :]  # re-scale a-side by D
                b = p2.reshape(npool, T, T)[t["pk_pgb"]]
                if hermitian and jnp.iscomplexobj(pool):
                    b = jnp.conj(b)
                W = packed_gemm(a, b).astype(pool.dtype)
                p2 = packed_scatter(p2, W, t["pk_dst"])
            return p2.reshape(pool.shape), d_arr, npiv

        def fact_ldlt(pool, eps, tables):
            d_arr = jnp.ones((nbc, T), pool.dtype)
            npiv = jnp.int32(0)
            for tag, t in plan_iter(tables):
                if packed:
                    if tag == "unroll":
                        pool, d_arr, npiv = ldlt_level_packed(
                            (pool, d_arr, npiv), dict(t, eps=eps)
                        )
                    else:

                        def body(carry, x):
                            return (
                                ldlt_level_packed(carry, dict(x, eps=eps)),
                                None,
                            )

                        (pool, d_arr, npiv), _ = lax.scan(
                            body, (pool, d_arr, npiv), t
                        )
                elif tag == "unroll":
                    pool, d_arr, npiv = ldlt_level(
                        (pool, d_arr, npiv), dict(t, eps=eps)
                    )
                else:

                    def body(carry, x):
                        return ldlt_level(carry, dict(x, eps=eps)), None

                    (pool, d_arr, npiv), _ = lax.scan(
                        body, (pool, d_arr, npiv), t
                    )
            return pool, d_arr, npiv

        jfn = jax.jit(fact_ldlt, donate_argnums=(0,) if donate else (),
                      **jit_opts)
        fn = lambda pool, eps: jfn(pool, eps, plan_tables)
        fn.e2_saved_flops = e2_saved
        return fn

    if kind == Factorization.LU:

        def lu_trsm_inv(pool, pool_u, t, linv, uinv_t):
            # both panel TRSMs as MXU matmuls against the fused inverses:
            # L(I,J) = A(I,J) U^{-1} = A @ Z^T ; Ut(I,J) = A(J,I)^T L^{-T}
            def trsm_body(carry, tp, tcpos):
                pool, pool_u = carry
                lp = jnp.einsum(
                    "bij,bkj->bik", pool[tp], uinv_t[tcpos],
                    preferred_element_type=pool.dtype,
                    precision=K.matmul_precision(),
                )
                up = jnp.einsum(
                    "bij,bkj->bik", pool_u[tp], linv[tcpos],
                    preferred_element_type=pool.dtype,
                    precision=K.matmul_precision(),
                )
                return pool.at[tp].set(lp), pool_u.at[tp].set(up)

            return _scan_chunks(
                (pool, pool_u), (t["tp"], t["tcpos"]), (npool, 0), trsm_body
            )

        def lu_trsm_stream(pool, pool_u, t, linv, uinv_t):
            # both TRSMs + bf16 panel streams for the cross-pool E2
            tp, tcpos = t["tp"], t["tcpos"]
            nt = int(tp.shape[0])
            chunk = _PANEL_CHUNK or nt

            def one(pool, pool_u, tpc, tcc):
                lp = jnp.einsum(
                    "bij,bkj->bik", pool[tpc], uinv_t[tcc],
                    preferred_element_type=pool.dtype,
                    precision=K.matmul_precision(),
                )
                up = jnp.einsum(
                    "bij,bkj->bik", pool_u[tpc], linv[tcc],
                    preferred_element_type=pool.dtype,
                    precision=K.matmul_precision(),
                )
                return (
                    pool.at[tpc].set(lp), pool_u.at[tpc].set(up), lp, up
                )

            if nt <= chunk:
                pool, pool_u, lp, up = one(pool, pool_u, tp, tcpos)
                return (
                    pool, pool_u,
                    lp.astype(update_dtype), up.astype(update_dtype),
                )
            nc = -(-nt // chunk)
            pad = nc * chunk - nt
            tp_p = K._pad_chunk(tp, pad, npool).reshape(nc, chunk)
            tcp_p = K._pad_chunk(tcpos, pad, 0).reshape(nc, chunk)
            offs = jnp.arange(nc, dtype=jnp.int32) * jnp.int32(chunk)
            xl0 = jnp.zeros((nc * chunk, T, T), update_dtype)
            xu0 = jnp.zeros((nc * chunk, T, T), update_dtype)

            def step(carry, x):
                pool, pool_u, xl, xu = carry
                tpc, tcc, off = x
                pool, pool_u, lp, up = one(pool, pool_u, tpc, tcc)
                xl = lax.dynamic_update_slice(
                    xl, lp.astype(update_dtype), (off, jnp.int32(0), jnp.int32(0))
                )
                xu = lax.dynamic_update_slice(
                    xu, up.astype(update_dtype), (off, jnp.int32(0), jnp.int32(0))
                )
                return (pool, pool_u, xl, xu), None

            (pool, pool_u, xl, xu), _ = lax.scan(
                step, (pool, pool_u, xl0, xu0), (tp_p, tcp_p, offs)
            )
            return pool, pool_u, xl, xu

        def lu_level_unroll(carry, t, eps):
            pool, pool_u, npiv = carry
            if "p_in" in t and not jnp.iscomplexobj(pool):
                # left-looking: A(I,K) -= L(I,J) @ U(J,K) into the L pool
                # (b = Ut tiles cached from the U pool), then the U-side
                # mirror for off-diagonal targets
                pool = gemm_scatter_ll(
                    pool, t["p_in"], src_pool=pool_u,
                    update_dtype=update_dtype,
                )
                if "p_in_nd" in t:
                    pool_u = gemm_scatter_ll(
                        pool_u, t["p_in_nd"], src_pool=pool,
                        update_dtype=update_dtype,
                    )
            if t["tp"].size:
                diag, linv, uinv_t, piv = K.getrf_inv_batch(
                    pool[t["diag"]], eps
                )
            else:
                diag, piv = K.getrf_batch(pool[t["diag"]], eps)
            pool = pool.at[t["diag"]].set(diag)
            npiv = npiv + piv.sum(dtype=jnp.int32)
            use_stream_lvl = (
                "stream" in t
                and "p_full" in t
                and update_dtype is not None
                and not jnp.iscomplexobj(pool)
            )
            if t["tp"].size:
                if use_stream_lvl:
                    pool, pool_u, xl, xu = lu_trsm_stream(
                        pool, pool_u, t, linv, uinv_t
                    )
                else:
                    pool, pool_u = lu_trsm_inv(
                        pool, pool_u, t, linv, uinv_t
                    )
            if use_stream_lvl:
                # A(I,K) -= L(I,J) @ U(J,K) from the bf16 panel streams
                pool = gemm_scatter_pipelined(
                    pool, t["p_full"], update_dtype=update_dtype,
                    xab=(xl, xu),
                )
                if "p_nd" in t:
                    pool_u = gemm_scatter_pipelined(
                        pool_u, t["p_nd"], update_dtype=update_dtype,
                        xab=(xu, xl),
                    )
            elif "p_full" in t and not jnp.iscomplexobj(pool):
                # A(I,K) -= L(I,J) @ U(J,K): fused kernel, b from the U pool
                pool = gemm_scatter_pipelined(
                    pool, t["p_full"], src_pool=pool_u,
                    update_dtype=update_dtype,
                )
                if "p_nd" in t:
                    pool_u = gemm_scatter_pipelined(
                        pool_u, t["p_nd"], src_pool=pool,
                        update_dtype=update_dtype,
                    )
            elif t["ga"].size:
                # A(I,K) -= L(I,J) @ U(J,K) = Lp[ga] @ Ut[gb]^T
                pool = K.gemm_scatter_ab(
                    pool, pool, pool_u, t["ga"], t["gb"], t["gd"],
                    update_dtype=update_dtype,
                )
                nd = t["gnd"]
                if nd.size:
                    pool_u = K.gemm_scatter_ab(
                        pool_u, pool_u, pool,
                        t["ga"][nd], t["gb"][nd], t["gd"][nd],
                        update_dtype=update_dtype,
                    )
            return pool, pool_u, npiv

        def lu_level_scan(carry, t, eps):
            pool, pool_u, npiv = carry
            diag, linv, uinv_t, piv = K.getrf_inv_batch(pool[t["diag"]], eps)
            pool = pool.at[t["diag"]].set(diag)
            valid = t["cols"] < nbc
            npiv = npiv + jnp.where(valid, piv, 0).sum(dtype=jnp.int32)
            pool, pool_u = lu_trsm_inv(pool, pool_u, t, linv, uinv_t)
            pool = K.gemm_scatter_ab(
                pool, pool, pool_u, t["ga"], t["gb"], t["gd"],
                update_dtype=update_dtype,
            )
            # U-side updates: diagonal targets are pre-masked to OOB (gdo)
            pool_u = K.gemm_scatter_ab(
                pool_u, pool_u, pool, t["ga"], t["gb"], t["gdo"],
                update_dtype=update_dtype,
            )
            return pool, pool_u, npiv

        def lu_level_packed(carry, t, eps):
            pool, pool_u, npiv = carry
            has_chunks = t["pk_pa"].shape[-1] > 0 or t["pk_gidx"].shape[-2] > 1
            if has_chunks:
                diag, linv, uinv_t, piv = K.getrf_inv_batch(pool[t["diag"]], eps)
            else:
                diag, piv = K.getrf_batch(pool[t["diag"]], eps)
            pool = pool.at[t["diag"]].set(diag)
            valid = t["cols"] < nbc
            npiv = npiv + jnp.where(valid, piv, 0).sum(dtype=jnp.int32)
            if not has_chunks:
                return pool, pool_u, npiv
            p2 = pool.reshape(npool * T, T)
            p2u = pool_u.reshape(npool * T, T)
            # both TRSMs on packed rows:
            # L rows: A(r, Jcols) @ U_jj^{-1} = P @ Z^T;  Ut rows: P_u @ L^{-T}
            Ol = jnp.einsum(
                "cij,ckj->cik", p2[t["pk_gidx"]], uinv_t[t["pk_cpos"]],
                preferred_element_type=pool.dtype,
                precision=K.matmul_precision(),
            )
            Ou = jnp.einsum(
                "cij,ckj->cik", p2u[t["pk_gidx"]], linv[t["pk_cpos"]],
                preferred_element_type=pool.dtype,
                precision=K.matmul_precision(),
            )
            p2 = p2.at[t["pk_gidx"]].set(Ol)
            p2u = p2u.at[t["pk_gidx"]].set(Ou)
            if t["pk_pa"].shape[-1]:
                pa = t["pk_pa"]
                Bl = p2.reshape(npool, T, T)[t["pk_pgb"]]
                Bu = p2u.reshape(npool, T, T)[t["pk_pgb"]]
                # L-side: A(r, J) -= L(r,:)U(:,J); rows landing in the
                # combined diag tile also carry its upper (U) part, so
                # pk_dst keeps diagonal tile-pairs and pk_dst_u drops them
                Wl = packed_gemm(Ol[pa], Bu).astype(pool.dtype)
                p2 = packed_scatter(p2, Wl, t["pk_dst"])
                Wu = packed_gemm(Ou[pa], Bl).astype(pool.dtype)
                p2u = packed_scatter(p2u, Wu, t["pk_dst_u"])
            return p2.reshape(pool.shape), p2u.reshape(pool.shape), npiv

        def fact_lu(pool, pool_u, eps, tables):
            npiv = jnp.int32(0)
            for tag, t in plan_iter(tables):
                if packed:
                    if tag == "unroll":
                        pool, pool_u, npiv = lu_level_packed(
                            (pool, pool_u, npiv), t, eps
                        )
                    else:

                        def body(carry, x):
                            return (
                                lu_level_packed(carry, x, eps),
                                None,
                            )

                        (pool, pool_u, npiv), _ = lax.scan(
                            body, (pool, pool_u, npiv), t
                        )
                elif tag == "unroll":
                    pool, pool_u, npiv = lu_level_unroll(
                        (pool, pool_u, npiv), t, eps
                    )
                else:

                    def body(carry, x):
                        return lu_level_scan(carry, x, eps), None

                    (pool, pool_u, npiv), _ = lax.scan(
                        body, (pool, pool_u, npiv), t
                    )
            return pool, pool_u, npiv

        jfn = jax.jit(fact_lu, donate_argnums=(0, 1) if donate else (),
                      **jit_opts)
        fn = lambda pool, pool_u, eps: jfn(pool, pool_u, eps, plan_tables)
        fn.e2_saved_flops = e2_saved
        return fn

    raise ValueError(f"unsupported factorization: {kind}")


def factorize(
    layout: SolverLayout,
    A_perm: sp.csc_matrix,
    kind: Factorization,
    dtype=np.float32,
    pivot_threshold: float = 1e-14,
    update_dtype=None,
    fact_fn=None,
    coef_fn=None,
) -> Factors:
    """Convenience host driver: coefinit + run the jitted program.

    ``coef_fn`` (from :func:`build_coefinit_fn`) builds the tile pool on
    device from the nnz values; without it the pool is assembled on the
    host and uploaded whole."""
    for_lu = kind == Factorization.LU
    anorm = float(abs(A_perm).max()) if A_perm.nnz else 1.0
    eps = jnp.asarray(pivot_threshold * anorm, dtype=dtype)
    fn = fact_fn or build_factorize_fn(layout, kind, update_dtype=update_dtype)
    if coef_fn is not None:
        baked = getattr(coef_fn, "dtype", None)
        if baked is not None and baked != np.dtype(dtype):
            raise ValueError(
                f"coef_fn was built for dtype {baked} but factorize was "
                f"called with dtype {np.dtype(dtype)}; rebuild the coefinit "
                "fn (build_coefinit_fn) with the matching dtype"
            )
        vals = jnp.asarray(sp.coo_matrix(A_perm).data.astype(dtype))
        if for_lu:
            pool, pool_u = coef_fn(vals)
        else:
            pool = coef_fn(vals)
            pool_u = None
    else:
        pool_np, pool_u_np = coefinit(
            layout, A_perm, dtype=dtype, for_lu=for_lu
        )
        pool = jnp.asarray(pool_np)
        pool_u = jnp.asarray(pool_u_np) if pool_u_np is not None else None
    if kind == Factorization.LLT:
        pool = fn(pool)
        # LL^T has no pivoting: breakdown surfaces as NaN on the diagonal.
        # Fail with a diagnosis instead of returning garbage (the reference
        # contract is "LLT assumes SPD"; LDLT/LU clamp tiny pivots).
        diag_of_col = layout.lookup(
            np.arange(layout.nbc), np.arange(layout.nbc)
        )
        dvals = jnp.diagonal(pool[diag_of_col], axis1=-2, axis2=-1)
        if bool(jnp.isnan(dvals).any() | jnp.isinf(dvals).any()):
            raise FloatingPointError(
                "LL^T factorization broke down (NaN/Inf pivot): the matrix "
                "is not positive definite. Use Factorization.LDLT (static "
                "pivoting) or LU for indefinite/unsymmetric systems."
            )
        return Factors(kind, layout, pool, None, None, 0)
    if kind in (Factorization.LDLT, Factorization.LDLH):
        pool, d, npiv = fn(pool, eps)
        return Factors(kind, layout, pool, None, d, int(npiv))
    pool, pool_u, npiv = fn(pool, pool_u, eps)
    return Factors(kind, layout, pool, pool_u, None, int(npiv))


def _tri_inverse_doubling(D, lower: bool, unit: bool):
    """Batched triangular-tile inverse by block doubling.

    ``lax.linalg.triangular_solve`` against an identity RHS lowers to a
    serial blocked loop that measured 31 s(!) for an (8600, 128, 128)
    batch on the v5e — it is the reason the fast-solve path was gated
    off at scale.  Block doubling runs in log2(T) rounds of two batched
    MXU matmuls each (total ~2/3·B·T³ flops, milliseconds):

      inv([[A, 0], [B, C]]) = [[Ai, 0], [-Ci·B·Ai, Ci]]      (lower)
      inv([[A, B], [0, C]]) = [[Ai, -Ai·B·Ci], [0, Ci]]      (upper)

    starting from the elementwise 1/diag (or ones for unit-diagonal).
    """
    B, T, _ = D.shape
    dt = D.dtype
    prec = K.matmul_precision()
    # Everything stays (B, T, T): if X inverts the granularity-s block
    # diagonal of D and M is the granularity-2s block diagonal, then
    #   X' = 2X - X·M·X
    # inverts M exactly (check [[A,0],[B,C]] against blkdiag(Ai, Ci)).
    # Two full-width batched MXU matmuls per round, log2(T) rounds —
    # earlier cuts that assembled (B, m, s, s) small blocks spent seconds
    # in lane-padding (s x s tiles pad to 8 x 128 on the VPU).
    eye = jnp.eye(T, dtype=dt)
    if unit:
        dd = jnp.ones((B, T), dt)
    else:
        dd = jnp.einsum("bii->bi", D)
    X = eye * (1.0 / dd)[:, :, None]
    idx = np.arange(T)
    s = 1
    while s < T:
        s *= 2
        blk = np.equal(idx[:, None] // s, idx[None, :] // s)
        tri = (
            np.tril(np.ones((T, T), bool))
            if lower else np.triu(np.ones((T, T), bool))
        )
        mask = jnp.asarray(blk & tri, dt)
        M = D * mask
        if unit:
            M = M - M * jnp.asarray(np.eye(T, dtype=bool), dt) + eye
        MX = jnp.einsum(
            "bij,bjk->bik", M, X, preferred_element_type=dt,
            precision=prec,
        )
        X = 2.0 * X - jnp.einsum(
            "bij,bjk->bik", X, MX, preferred_element_type=dt,
            precision=prec,
        )
    return X


def build_diag_inverse_fn(layout: SolverLayout, kind: Factorization,
                          hermitian: bool = True):
    """Jitted batched inverse of every diagonal tile (log2(T) doubling
    rounds of batched MXU matmuls).  The inverses turn all solve-sweep
    triangular solves into MXU matmuls — the solve latency is otherwise
    dominated by per-level T-step sequential loops (the updo hot-path
    observation from SURVEY.md §3.4).

    Returns fn(pool[, pool_u]) -> dinv (and dinv_u for LU)."""
    diag_idx = np.asarray(
        layout.lookup(np.arange(layout.nbc), np.arange(layout.nbc))
    ).astype(np.int32)

    unit = kind != Factorization.LLT  # LDLT/LDLH/LU have unit lower factors

    def inv_lower(pool):
        return _tri_inverse_doubling(pool[diag_idx], lower=True, unit=unit)

    if kind != Factorization.LU:
        return jax.jit(inv_lower)

    def inv_lu(pool, pool_u):
        del pool_u  # U diag lives in the combined L/U tile (upper part)
        dinv_l = inv_lower(pool)
        dinv_u = _tri_inverse_doubling(
            pool[diag_idx], lower=False, unit=False
        )
        return dinv_l, dinv_u

    return jax.jit(inv_lu)
