"""Out-of-core factorization: level-streamed windows under an HBM budget.

The reference pages coeftab blocks to disk DURING factorization, bounded
by IPARM_OOC_LIMIT (``src/sopalin/src/ooc.c``: an IO thread writes a
cblk's coefficients after its last use and reads them back on demand —
SURVEY.md §2 row 15).  On TPU the scarce tier is HBM and the backing
store is host RAM, and the streaming must align with the jitted level
programs, so the schedule is segment-granular:

  * the elimination levels are split into consecutive SEGMENTS whose
    device footprint fits the budget: the segment's own panel tiles (its
    "window") plus a compact accumulator for updates that land beyond it;
  * the host keeps the full tile pool in RAM; per segment it uploads the
    window (A values + all updates accumulated so far), runs one jitted
    program over remapped level tables — trailing updates into window
    tiles apply in place, updates into later segments accumulate into
    export slots — and scatter-adds the export buffer back into the host
    pool (the host-side extend-add);
  * the triangular solves stream the same windows per segment while the
    (nbc, T, R) right-hand side stays resident.

Max problem size is bounded by host RAM instead of HBM, which is the
reference's OOC contract.  All factorization kinds stream: LL^T,
LDL^T/LDL^H (the d pivots and the pivot counter ride along as small
resident arrays) and LU (two windows — L and Ut — per segment, with
separate export accumulators; reference ooc.c pages every kind).

The budget covers the GEMM/TRSM transients too: plan_ooc reserves
``transient_frac`` of the budget and the segment programs chunk their
gathers to that reservation (lax.scan over fixed chunks, same scheme as
kernels._GEMM_CHUNK), so one wide level cannot transiently exceed the
limit the plan enforces.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from pastix_tpu.analyze.layout import SolverLayout
from pastix_tpu.numeric import kernels as K


@dataclasses.dataclass
class OOCSegment:
    win: np.ndarray  # sorted pool idx of the window tiles
    touched_out: np.ndarray  # sorted pool idx of beyond-window targets
    tables: list  # remapped per-level tables (buf coordinates)
    n_win: int
    n_out: int

    def footprint_tiles(self) -> int:
        return self.n_win + self.n_out + 1  # + sacrificial slot


@dataclasses.dataclass
class OOCPlan:
    layout: SolverLayout
    segments: list
    budget_tiles: int
    gemm_chunk: int = 0  # 0 = unchunked; else max gather triples per chunk
    two_pools: bool = False  # LU: window/export tiles count double

    def max_footprint_tiles(self) -> int:
        """Peak device tiles incl. the chunked-GEMM transient (a, b, W
        gathers + the TRSM panel transient share the reservation)."""
        f = max(s.footprint_tiles() for s in self.segments)
        npools = 2 if self.two_pools else 1
        return f * npools + 4 * self.gemm_chunk


def plan_ooc(
    layout: SolverLayout,
    budget_bytes: int,
    dtype_bytes: int = 4,
    levels: Optional[list] = None,
    transient_frac: float = 0.25,
    two_pools: bool = False,
) -> OOCPlan:
    """Greedy segmentation: take consecutive levels while the window +
    export accumulator stays under the budget.  A single level that alone
    exceeds the budget still becomes its own segment (the floor of this
    scheme; the reference pages at cblk granularity and has the same
    floor at its largest supernode).

    ``transient_frac`` of the budget is reserved for the segment programs'
    GEMM/TRSM gather transients; the emitted ``gemm_chunk`` keeps them
    inside the reservation.  ``two_pools`` (LU) counts every window and
    export tile twice (L and Ut buffers)."""
    if levels is None:
        levels = layout.levels
    T = layout.T
    tile_bytes = T * T * dtype_bytes
    total_tiles = max(2, int(budget_bytes // tile_bytes))
    npools = 2 if two_pools else 1
    budget_tiles = max(2, int(total_tiles * (1.0 - transient_frac)) // npools)
    # transient per chunk: a + b + W gathers (3) and a little slack for
    # the TRSM panel pair — 4 tiles per chunk element
    gemm_chunk = max(16, (total_tiles - budget_tiles * npools) // 4)

    col_ptr = np.searchsorted(layout.blk_col, np.arange(layout.nbc + 1))

    def col_tiles(cols):
        return np.concatenate(
            [np.arange(col_ptr[c], col_ptr[c + 1]) for c in cols]
        ) if len(cols) else np.empty(0, np.int64)

    # pre-split any level whose own window would exceed the budget into
    # column-subset sub-levels (columns within a level are independent,
    # so a subset is a valid schedule unit).  Found at the 10M-dof rung:
    # one level's tiles reached 60 GiB — far past any HBM (exp_10m.py).
    # The remaining floor is a single COLUMN's panel + exports, matching
    # the reference's cblk-granular paging floor (src/sopalin/src/ooc.c).
    tiles_of_col = np.diff(col_ptr)
    split_levels = []
    for lv in levels:
        win_sz = int(tiles_of_col[np.asarray(lv.cols)].sum())
        exp_sz = int(np.unique(lv.gemm_d).size) if lv.gemm_d.size else 0
        if win_sz + exp_sz <= budget_tiles:
            split_levels.append(lv)
            continue
        target = max(tiles_of_col[np.asarray(lv.cols)].max(),
                     budget_tiles // 2)
        groups, cur, acc = [], [], 0
        for c in np.asarray(lv.cols):
            if cur and acc + tiles_of_col[c] > target:
                groups.append(np.asarray(cur))
                cur, acc = [], 0
            cur.append(c)
            acc += int(tiles_of_col[c])
        if cur:
            groups.append(np.asarray(cur))
        for g in groups:
            cm = np.isin(lv.cols, g)
            tm = np.isin(lv.trsm_col, g)
            gm = np.isin(lv.gemm_k, g)
            split_levels.append(type(lv)(
                cols=lv.cols[cm],
                diag=lv.diag[cm],
                trsm_panel=lv.trsm_panel[tm],
                trsm_diag=lv.trsm_diag[tm],
                trsm_row=lv.trsm_row[tm],
                trsm_col=lv.trsm_col[tm],
                gemm_a=lv.gemm_a[gm],
                gemm_b=lv.gemm_b[gm],
                gemm_d=lv.gemm_d[gm],
                gemm_k=lv.gemm_k[gm],
                gemm_nondiag=lv.gemm_nondiag[gm],
            ))
    levels = split_levels

    segments = []
    i = 0
    nlev = len(levels)
    while i < nlev:
        j = i
        win_cols: list = []
        gd_all: list = []
        chosen = None
        while j < nlev:
            cand_cols = win_cols + [levels[j].cols]
            cand_gd = gd_all + [levels[j].gemm_d]
            win = col_tiles(np.concatenate(cand_cols))
            gds = (
                np.unique(np.concatenate(cand_gd))
                if any(g.size for g in cand_gd)
                else np.empty(0, np.int64)
            )
            out = np.setdiff1d(gds, win, assume_unique=False)
            foot = win.size + out.size + 1
            if foot <= budget_tiles or j == i:
                chosen = (win, out, j)
                win_cols, gd_all = cand_cols, cand_gd
                j += 1
                if foot > budget_tiles:
                    break  # single over-budget level: emit alone
            else:
                break
        win, out, jlast = chosen
        win = np.sort(win)
        out = np.sort(out)
        n_win, n_out = win.size, out.size

        # export-bounded splitting (10M rung, round 5): one top level's
        # beyond-window update TARGETS alone can exceed any budget (31.5
        # GiB of export slots measured at 9.9M dof) — the column
        # pre-split cannot shrink them because every column updates
        # ~the whole trailing matrix.  Emit multiple PASSES over the
        # same window: pass 0 factors (diag+TRSM) and applies the
        # in-window + first-slice updates; passes k>0 re-upload the
        # (already factored) window with empty diag/TRSM tables and
        # apply the next slice of export targets.  The reference's
        # cblk-granular paging re-reads panels the same way
        # (src/sopalin/src/ooc.c).
        avail_out = budget_tiles - n_win - 1
        if n_out > avail_out and avail_out >= max(32, n_win // 8):
            nslice = -(-n_out // avail_out)
            out_slices = np.array_split(out, nslice)
        else:
            out_slices = [out]

        if len(out_slices) > 1:
            lv_list = levels[i:jlast + 1]
            for kslice, osl in enumerate(out_slices):
                n_osl = osl.size

                def remap_win(idx, win=win, n_win=n_win):
                    pos = np.searchsorted(win, idx)
                    assert np.all(win[np.minimum(pos, n_win - 1)] == idx)
                    return pos.astype(np.int32)

                def remap_tgt(idx, osl=osl, n_osl=n_osl):
                    pos = np.searchsorted(win, idx)
                    hit = (pos < n_win) & (
                        win[np.minimum(pos, n_win - 1)] == idx
                    )
                    pos_out = np.searchsorted(osl, idx)
                    return np.where(
                        hit, pos,
                        n_win + np.minimum(pos_out, max(n_osl - 1, 0)),
                    ).astype(np.int32)

                tables = []
                for lv in lv_list:
                    gd_np = np.asarray(lv.gemm_d)
                    # pass 0 keeps in-window targets + slice 0; later
                    # passes only their slice (in-window would re-apply)
                    in_win = np.isin(gd_np, win)
                    in_sl = np.isin(gd_np, osl)
                    gm = in_sl | (in_win if kslice == 0 else
                                  np.zeros(gd_np.size, bool))
                    e = np.empty(0, np.int32)
                    t = {
                        "cols": (np.asarray(lv.cols, np.int32)
                                 if kslice == 0 else e),
                        "diag": (remap_win(lv.diag) if kslice == 0 else e),
                        "tp": (remap_win(lv.trsm_panel)
                               if kslice == 0 else e),
                        "tr": (np.asarray(lv.trsm_row, np.int32)
                               if kslice == 0 else e),
                        "tc": (np.asarray(lv.trsm_col, np.int32)
                               if kslice == 0 else e),
                        "tcpos": (np.searchsorted(
                            lv.cols, lv.trsm_col
                        ).astype(np.int32) if kslice == 0 else e),
                        "ga": remap_win(lv.gemm_a[gm]),
                        "gb": remap_win(lv.gemm_b[gm]),
                        "gd": remap_tgt(gd_np[gm]),
                        "gk": np.asarray(lv.gemm_k[gm], np.int32),
                    }
                    if two_pools:
                        nd = np.flatnonzero(
                            np.asarray(lv.gemm_nondiag)[gm]
                        )
                        t["ga_nd"] = t["ga"][nd]
                        t["gb_nd"] = t["gb"][nd]
                        t["gd_nd"] = t["gd"][nd]
                    tables.append(t)
                segments.append(
                    OOCSegment(
                        win=win, touched_out=osl, tables=tables,
                        n_win=n_win, n_out=n_osl,
                    )
                )
            i = jlast + 1
            continue

        # remap the segment's level tables into buf coordinates:
        # [0, n_win) window, [n_win, n_win+n_out) exports, last = pad
        def remap_win(idx):
            pos = np.searchsorted(win, idx)
            assert np.all(win[np.minimum(pos, n_win - 1)] == idx)
            return pos.astype(np.int32)

        def remap_tgt(idx):
            pos = np.searchsorted(win, idx)
            hit = (pos < n_win) & (win[np.minimum(pos, n_win - 1)] == idx)
            pos_out = np.searchsorted(out, idx)
            return np.where(
                hit, pos, n_win + np.minimum(pos_out, max(n_out - 1, 0))
            ).astype(np.int32)

        tables = []
        for lv in levels[i:jlast + 1]:
            t = {
                "cols": np.asarray(lv.cols, np.int32),
                "diag": remap_win(lv.diag),
                "tp": remap_win(lv.trsm_panel),
                "tr": np.asarray(lv.trsm_row, np.int32),
                "tc": np.asarray(lv.trsm_col, np.int32),
                "tcpos": np.searchsorted(lv.cols, lv.trsm_col).astype(
                    np.int32
                ),
                "ga": remap_win(lv.gemm_a),
                "gb": remap_win(lv.gemm_b),
                "gd": remap_tgt(lv.gemm_d),
                "gk": np.asarray(lv.gemm_k, np.int32),
            }
            if two_pools:
                # LU: the U-pool update targets (off-diagonal pairs only —
                # diagonal targets live in the L window's combined tile)
                nd = np.flatnonzero(np.asarray(lv.gemm_nondiag))
                t["ga_nd"] = t["ga"][nd]
                t["gb_nd"] = t["gb"][nd]
                t["gd_nd"] = t["gd"][nd]
            tables.append(t)
        segments.append(
            OOCSegment(
                win=win, touched_out=out, tables=tables,
                n_win=n_win, n_out=n_out,
            )
        )
        i = jlast + 1
    return OOCPlan(layout=layout, segments=segments,
                   budget_tiles=budget_tiles, gemm_chunk=gemm_chunk,
                   two_pools=two_pools)


def _chunked_trsm(buf, tp, inv_panels, tcpos, chunk, conj_inv=False):
    """Panel TRSM-as-matmul over bounded chunks (transient 2*chunk tiles)."""
    from pastix_tpu.numeric.factorize import _scan_chunks

    nbuf = buf.shape[0]

    def body(buf, tp_c, pos_c):
        inv_p = inv_panels[pos_c]
        if conj_inv and jnp.iscomplexobj(buf):
            inv_p = jnp.conj(inv_p)
        panels = jnp.einsum(
            "bij,bkj->bik", buf[tp_c], inv_p,
            preferred_element_type=buf.dtype,
            precision=K.matmul_precision(),
        )
        return buf.at[tp_c].set(panels)

    return _scan_chunks(buf, (tp, tcpos), (nbuf, 0), body, chunk=chunk)


def build_segment_fact_fn(layout: SolverLayout, seg: OOCSegment,
                          hermitian: bool = True, update_dtype=None,
                          chunk: int = 0):
    """Jitted LL^T program over one segment's buffer (window + exports).

    ``chunk`` bounds the GEMM/TRSM gather transients (plan_ooc reserves
    transient_frac of the budget for them)."""
    T = layout.T

    def seg_fact(buf, tabs):
        for t in tabs:
            diag = K.potrf_batch(jnp.tril(buf[t["diag"]]),
                                 hermitian=hermitian)
            buf = buf.at[t["diag"]].set(diag)
            if t["tp"].shape[0]:
                eye = jnp.broadcast_to(
                    jnp.eye(T, dtype=buf.dtype),
                    (t["diag"].shape[0], T, T),
                )
                dinv = lax.linalg.triangular_solve(
                    diag, eye, left_side=True, lower=True
                )
                buf = _chunked_trsm(
                    buf, t["tp"], dinv, t["tcpos"], chunk,
                    conj_inv=hermitian,
                )
            if t["ga"].shape[0]:
                buf = K.gemm_scatter(
                    buf, t["ga"], t["gb"], t["gd"],
                    update_dtype=update_dtype, hermitian=hermitian,
                    chunk=chunk,
                )
        return buf

    jfn = jax.jit(seg_fact, donate_argnums=(0,))
    tabs_dev = jax.device_put(
        [{k: v for k, v in t.items() if k not in ("tr", "tc", "cols", "gk")}
         for t in seg.tables]
    )
    return lambda buf: jfn(buf, tabs_dev)


def build_segment_fact_fn_ldlt(layout: SolverLayout, seg: OOCSegment,
                               hermitian: bool = False, update_dtype=None,
                               chunk: int = 0):
    """Jitted LDL^T/LDL^H program over one segment's buffer.

    Carries the resident (nbc, T) pivot array and the static-pivot counter
    across segments (they are tiny next to the windows); update GEMMs
    scale the a-side by the source column's D, mirroring the resident
    ldlt_level (factorize.py)."""
    from pastix_tpu.numeric.factorize import _sym_lower

    T, nbc = layout.T, layout.nbc

    def seg_fact(buf, d_arr, npiv, eps, tabs):
        for t in tabs:
            L, d, dinv, piv = K.ldlt_inv_batch(
                _sym_lower(buf[t["diag"]], hermitian), eps, hermitian
            )
            buf = buf.at[t["diag"]].set(L)
            d_arr = d_arr.at[t["cols"]].set(d)
            valid = t["cols"] < nbc
            npiv = npiv + jnp.where(valid, piv, 0).sum(dtype=jnp.int32)
            if t["tp"].shape[0]:
                from pastix_tpu.numeric.factorize import _scan_chunks

                nbuf_ = buf.shape[0]

                def trsm_body(buf, tp_c, pos_c, tc_c):
                    inv_p = dinv[pos_c]
                    if hermitian and jnp.iscomplexobj(buf):
                        inv_p = jnp.conj(inv_p)
                    panels = jnp.einsum(
                        "bij,bkj->bik", buf[tp_c], inv_p,
                        preferred_element_type=buf.dtype,
                        precision=K.matmul_precision(),
                    ) / d_arr[tc_c][:, None, :]
                    return buf.at[tp_c].set(panels)

                buf = _scan_chunks(
                    buf, (t["tp"], t["tcpos"], t["tc"]), (nbuf_, 0, 0),
                    trsm_body, chunk=chunk,
                )
            if t["ga"].shape[0]:
                buf = K.gemm_scatter(
                    buf, t["ga"], t["gb"], t["gd"],
                    scale_cols=d_arr[t["gk"]],
                    update_dtype=update_dtype, hermitian=hermitian,
                    chunk=chunk,
                )
        return buf, d_arr, npiv

    jfn = jax.jit(seg_fact, donate_argnums=(0, 1, 2))
    tabs_dev = jax.device_put(
        [{k: v for k, v in t.items() if k not in ("tr",)}
         for t in seg.tables]
    )
    # gk = source block column of each gemm triple (host-built per segment)
    return lambda buf, d_arr, npiv, eps: jfn(buf, d_arr, npiv, eps, tabs_dev)


def build_segment_fact_fn_lu(layout: SolverLayout, seg: OOCSegment,
                             update_dtype=None, chunk: int = 0):
    """Jitted LU program over one segment's two buffers (L and Ut windows
    + exports).  Mirrors factorize.lu_level_unroll on remapped tables:
    combined-LU diagonal factor with static pivoting, both panel TRSMs as
    matmuls against the fused inverses, cross-pool trailing updates
    (L <- L - Lp @ Ut^T into gd; Ut <- Ut - Utp @ Lp^T into off-diagonal
    targets).  Reference: src/sopalin/src/ooc.c pages the LU coeftabs the
    same way it pages Cholesky's."""
    from pastix_tpu.numeric.factorize import _scan_chunks

    nbc = layout.nbc

    def seg_fact(buf_l, buf_u, npiv, eps, tabs):
        for t in tabs:
            diag, linv, uinv_t, piv = K.getrf_inv_batch(
                buf_l[t["diag"]], eps
            )
            buf_l = buf_l.at[t["diag"]].set(diag)
            valid = t["cols"] < nbc
            npiv = npiv + jnp.where(valid, piv, 0).sum(dtype=jnp.int32)
            if t["tp"].shape[0]:
                nbuf_ = buf_l.shape[0]

                def trsm_body(carry, tp_c, pos_c):
                    bl, bu = carry
                    lp = jnp.einsum(
                        "bij,bkj->bik", bl[tp_c], uinv_t[pos_c],
                        preferred_element_type=bl.dtype,
                        precision=K.matmul_precision(),
                    )
                    up = jnp.einsum(
                        "bij,bkj->bik", bu[tp_c], linv[pos_c],
                        preferred_element_type=bu.dtype,
                        precision=K.matmul_precision(),
                    )
                    return bl.at[tp_c].set(lp), bu.at[tp_c].set(up)

                buf_l, buf_u = _scan_chunks(
                    (buf_l, buf_u), (t["tp"], t["tcpos"]), (nbuf_, 0),
                    trsm_body, chunk=chunk,
                )
            if t["ga"].shape[0]:
                buf_l = K.gemm_scatter_ab(
                    buf_l, buf_l, buf_u, t["ga"], t["gb"], t["gd"],
                    update_dtype=update_dtype, chunk=chunk,
                )
            if t["ga_nd"].shape[0]:
                buf_u = K.gemm_scatter_ab(
                    buf_u, buf_u, buf_l,
                    t["ga_nd"], t["gb_nd"], t["gd_nd"],
                    update_dtype=update_dtype, chunk=chunk,
                )
        return buf_l, buf_u, npiv

    jfn = jax.jit(seg_fact, donate_argnums=(0, 1, 2))
    keep = ("diag", "tp", "tcpos", "cols", "ga", "gb", "gd",
            "ga_nd", "gb_nd", "gd_nd")
    tabs_dev = jax.device_put(
        [{k: v for k, v in t.items() if k in keep} for t in seg.tables]
    )
    return lambda bl, bu, npiv, eps: jfn(bl, bu, npiv, eps, tabs_dev)


def factorize_ooc_lu(
    layout: SolverLayout,
    plan: OOCPlan,
    host_pool: np.ndarray,
    host_pool_u: np.ndarray,
    eps,
    update_dtype=None,
    verbose: bool = False,
):
    """Stream the LU factorization; modifies both host pools in place.

    Returns (host_pool, host_pool_u, npiv)."""
    T = layout.T
    npiv = jnp.zeros((), jnp.int32)
    eps_dev = jnp.asarray(eps, host_pool.dtype)
    for si, seg in enumerate(plan.segments):
        fn = getattr(seg, "_fact_fn_lu", None)
        if fn is None:
            fn = build_segment_fact_fn_lu(
                layout, seg, update_dtype=update_dtype,
                chunk=plan.gemm_chunk,
            )
            seg._fact_fn_lu = fn
        ze = np.zeros((seg.n_out + 1, T, T), host_pool.dtype)
        bl0 = np.concatenate([host_pool[seg.win], ze])
        bu0 = np.concatenate([host_pool_u[seg.win], ze])
        bl, bu, npiv = fn(jnp.asarray(bl0), jnp.asarray(bu0), npiv, eps_dev)
        bl, bu = np.asarray(bl), np.asarray(bu)
        host_pool[seg.win] = bl[: seg.n_win]
        host_pool_u[seg.win] = bu[: seg.n_win]
        if seg.n_out:
            sl = slice(seg.n_win, seg.n_win + seg.n_out)
            host_pool[seg.touched_out] += bl[sl]
            host_pool_u[seg.touched_out] += bu[sl]
        if verbose:
            print(
                f"[pastix-tpu] ooc segment {si + 1}/{len(plan.segments)}: "
                f"win={seg.n_win} out={seg.n_out} tiles (x2 pools)"
            )
    return host_pool, host_pool_u, int(npiv)


def factorize_ooc_ldlt(
    layout: SolverLayout,
    plan: OOCPlan,
    host_pool: np.ndarray,
    eps,
    hermitian: bool = False,
    update_dtype=None,
    verbose: bool = False,
):
    """Stream the LDL^T factorization; returns (host_pool, d, npiv)."""
    T, nbc = layout.T, layout.nbc
    d_arr = jnp.ones((nbc, T), host_pool.dtype)
    npiv = jnp.zeros((), jnp.int32)
    eps_dev = jnp.asarray(eps, host_pool.dtype)
    for si, seg in enumerate(plan.segments):
        fn = getattr(seg, "_fact_fn_ldlt", None)
        if fn is None:
            fn = build_segment_fact_fn_ldlt(
                layout, seg, hermitian=hermitian, update_dtype=update_dtype,
                chunk=plan.gemm_chunk,
            )
            seg._fact_fn_ldlt = fn
        buf0 = np.concatenate(
            [
                host_pool[seg.win],
                np.zeros((seg.n_out + 1, T, T), host_pool.dtype),
            ]
        )
        buf, d_arr, npiv = fn(jnp.asarray(buf0), d_arr, npiv, eps_dev)
        buf = np.asarray(buf)
        host_pool[seg.win] = buf[: seg.n_win]
        if seg.n_out:
            host_pool[seg.touched_out] += buf[seg.n_win: seg.n_win + seg.n_out]
        if verbose:
            print(
                f"[pastix-tpu] ooc segment {si + 1}/{len(plan.segments)}: "
                f"win={seg.n_win} out={seg.n_out} tiles"
            )
    return host_pool, np.asarray(d_arr), int(npiv)


def factorize_ooc(
    layout: SolverLayout,
    plan: OOCPlan,
    host_pool: np.ndarray,
    hermitian: bool = True,
    update_dtype=None,
    verbose: bool = False,
) -> np.ndarray:
    """Stream the LL^T factorization through the segment windows.

    ``host_pool`` (npool, T, T) numpy holds A values on entry and the
    factor on return (modified in place)."""
    T = layout.T
    for si, seg in enumerate(plan.segments):
        fn = getattr(seg, "_fact_fn", None)
        if fn is None:
            fn = build_segment_fact_fn(
                layout, seg, hermitian=hermitian, update_dtype=update_dtype,
                chunk=plan.gemm_chunk,
            )
            seg._fact_fn = fn
        buf0 = np.concatenate(
            [
                host_pool[seg.win],
                np.zeros((seg.n_out + 1, T, T), host_pool.dtype),
            ]
        )
        buf = np.asarray(fn(jnp.asarray(buf0)))
        host_pool[seg.win] = buf[: seg.n_win]
        if seg.n_out:
            # host-side extend-add: exports already hold -(sum contribs)
            host_pool[seg.touched_out] += buf[seg.n_win: seg.n_win + seg.n_out]
        if verbose:
            print(
                f"[pastix-tpu] ooc segment {si + 1}/{len(plan.segments)}: "
                f"win={seg.n_win} out={seg.n_out} tiles"
            )
    return host_pool


def build_segment_solve_fns(layout: SolverLayout, seg: OOCSegment,
                            hermitian: bool = True, unit: bool = False):
    """Jitted forward / backward partial sweeps over one segment window.

    fwd(win_tiles, y) and bwd(win_tiles, x) carry the full (nbc, T, R)
    RHS; only the segment's levels are applied.  ``unit``: unit-diagonal
    sweeps (the LDL^T factor; the D scaling happens between the sweeps in
    solve_ooc_ldlt)."""
    from pastix_tpu.solve import _fwd_level, _bwd_level

    def fwd(win, y, tabs):
        for t in tabs:
            y = _fwd_level(win, y, t, unit=unit)
        return y

    def bwd(win, x, tabs):
        for t in reversed(list(tabs)):
            x = _bwd_level(win, win, x, t, lower_t=True, unit=unit,
                           conj=hermitian)
        return x

    tabs_dev = jax.device_put([
        {k: t[k] for k in ("cols", "diag", "tp", "tr", "tc")}
        for t in seg.tables
    ])
    jf = jax.jit(fwd)
    jb = jax.jit(bwd)
    return (
        lambda win, y: jf(win, y, tabs_dev),
        lambda win, x: jb(win, x, tabs_dev),
    )


def build_segment_solve_fns_lu(layout: SolverLayout, seg: OOCSegment):
    """Jitted partial sweeps for streamed LU: forward Ly=b (unit lower, L
    window), backward Ux=y (upper from the combined diag tile in the L
    window, off-diagonal contributions from the Ut window)."""
    from pastix_tpu.solve import _fwd_level, _bwd_level

    def fwd(win_l, y, tabs):
        for t in tabs:
            y = _fwd_level(win_l, y, t, unit=True)
        return y

    def bwd(win_u, win_l, x, tabs):
        for t in reversed(list(tabs)):
            x = _bwd_level(win_u, win_l, x, t, lower_t=False, unit=False)
        return x

    tabs_dev = jax.device_put([
        {k: t[k] for k in ("cols", "diag", "tp", "tr", "tc")}
        for t in seg.tables
    ])
    jf = jax.jit(fwd)
    jb = jax.jit(bwd)
    return (
        lambda win_l, y: jf(win_l, y, tabs_dev),
        lambda win_u, win_l, x: jb(win_u, win_l, x, tabs_dev),
    )


def solve_ooc(
    layout: SolverLayout,
    plan: OOCPlan,
    host_pool: np.ndarray,
    b_blocks: np.ndarray,
    hermitian: bool = True,
    d: Optional[np.ndarray] = None,
    host_pool_u: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Streamed solve: forward over segments, then backward.

    With ``d`` (the LDL^T pivots, (nbc, T)): unit-diagonal sweeps with the
    D scaling applied between them — the streamed twin of solve.py's
    solve_ldlt.  With ``host_pool_u`` (streamed LU): unit-lower forward on
    the L windows, upper backward on the Ut windows.

    By default the sweeps run on the HOST CPU backend: the factors are
    already host-resident after streaming, and re-streaming every window
    through the device (x2 directions x every refinement iteration)
    made the refined OOC solve transfer-dominated — minutes per
    iteration on the remote-TPU tunnel (round 4, 80^3 x 4 segments).
    The triangular sweeps are latency-bound, not flop-bound, so the CPU
    loses little; PASTIX_OOC_HOST_SOLVE=0 keeps them on the accelerator.
    """
    import os as _os

    host_solve = _os.environ.get("PASTIX_OOC_HOST_SOLVE", "1")
    if host_solve != "0" and (
        jax.default_backend() != "cpu" or host_solve == "force"
    ):
        with jax.default_device(jax.devices("cpu")[0]):
            return _solve_ooc_impl(
                layout, plan, host_pool, b_blocks, hermitian=hermitian,
                d=d, host_pool_u=host_pool_u, cache_tag="_cpu",
            )
    return _solve_ooc_impl(
        layout, plan, host_pool, b_blocks, hermitian=hermitian, d=d,
        host_pool_u=host_pool_u,
    )


def _solve_ooc_impl(
    layout: SolverLayout,
    plan: OOCPlan,
    host_pool: np.ndarray,
    b_blocks: np.ndarray,
    hermitian: bool = True,
    d: Optional[np.ndarray] = None,
    host_pool_u: Optional[np.ndarray] = None,
    cache_tag: str = "",
) -> np.ndarray:
    if host_pool_u is not None:
        y = jnp.asarray(b_blocks)
        fns = []
        for seg in plan.segments:
            f = getattr(seg, "_solve_fns_lu" + cache_tag, None)
            if f is None:
                f = build_segment_solve_fns_lu(layout, seg)
                setattr(seg, "_solve_fns_lu" + cache_tag, f)
            fns.append(f)
        def _sync_lu(v):
            np.asarray(v.ravel()[-1:])  # see _sync below: free windows
            return v

        for seg, (fwd, _) in zip(plan.segments, fns):
            win = jnp.asarray(host_pool[seg.win])
            y = _sync_lu(fwd(win, y))
            del win
        for seg, (_, bwd) in zip(reversed(plan.segments), reversed(fns)):
            win_u = jnp.asarray(host_pool_u[seg.win])
            win_l = jnp.asarray(host_pool[seg.win])
            y = _sync_lu(bwd(win_u, win_l, y))
            del win_u, win_l
        return np.asarray(y)
    unit = d is not None
    y = jnp.asarray(b_blocks)
    fns = []
    cache = ("_solve_fns_unit" if unit else "_solve_fns") + cache_tag
    for seg in plan.segments:
        f = getattr(seg, cache, None)
        if f is None:
            f = build_segment_solve_fns(
                layout, seg, hermitian=hermitian, unit=unit
            )
            setattr(seg, cache, f)
        fns.append(f)
    def _sync(v):
        # force completion (block_until_ready is unreliable on the
        # remote-TPU tunnel) so the previous window's buffer can free
        # BEFORE the next ~10 GB window uploads — holding two windows
        # at once OOM'd the 1.33M auto-OOC solve
        np.asarray(v.ravel()[-1:])
        return v

    for seg, (fwd, _) in zip(plan.segments, fns):
        win = jnp.asarray(host_pool[seg.win])
        y = _sync(fwd(win, y))
        del win
    if unit:
        y = y / jnp.asarray(d)[..., None]
    for seg, (_, bwd) in zip(reversed(plan.segments), reversed(fns)):
        win = jnp.asarray(host_pool[seg.win])
        y = _sync(bwd(win, y))
        del win
    return np.asarray(y)
