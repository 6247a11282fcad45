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
reference's OOC contract.  LL^T and LDL^T/LDL^H stream (the d pivots and
the pivot counter ride along as small resident arrays); LU keeps the
post-factorization offload in pastix.py (two pools double the window
bookkeeping — the same greedy segmentation applies when needed).
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

    def max_footprint_tiles(self) -> int:
        return max(s.footprint_tiles() for s in self.segments)


def plan_ooc(
    layout: SolverLayout,
    budget_bytes: int,
    dtype_bytes: int = 4,
    levels: Optional[list] = None,
) -> OOCPlan:
    """Greedy segmentation: take consecutive levels while the window +
    export accumulator stays under the budget.  A single level that alone
    exceeds the budget still becomes its own segment (the floor of this
    scheme; the reference pages at cblk granularity and has the same
    floor at its largest supernode)."""
    if levels is None:
        levels = layout.levels
    T = layout.T
    tile_bytes = T * T * dtype_bytes
    budget_tiles = max(2, int(budget_bytes // tile_bytes))

    col_ptr = np.searchsorted(layout.blk_col, np.arange(layout.nbc + 1))

    def col_tiles(cols):
        return np.concatenate(
            [np.arange(col_ptr[c], col_ptr[c + 1]) for c in cols]
        ) if len(cols) else np.empty(0, np.int64)

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
            tables.append({
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
            })
        segments.append(
            OOCSegment(
                win=win, touched_out=out, tables=tables,
                n_win=n_win, n_out=n_out,
            )
        )
        i = jlast + 1
    return OOCPlan(layout=layout, segments=segments,
                   budget_tiles=budget_tiles)


def build_segment_fact_fn(layout: SolverLayout, seg: OOCSegment,
                          hermitian: bool = True, update_dtype=None):
    """Jitted LL^T program over one segment's buffer (window + exports)."""
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
                inv_p = dinv[t["tcpos"]]
                if hermitian and jnp.iscomplexobj(buf):
                    inv_p = jnp.conj(inv_p)
                panels = jnp.einsum(
                    "bij,bkj->bik", buf[t["tp"]], inv_p,
                    preferred_element_type=buf.dtype,
                    precision=K.matmul_precision(),
                )
                buf = buf.at[t["tp"]].set(panels)
            if t["ga"].shape[0]:
                a = buf[t["ga"]]
                b = a if t["ga"] is t["gb"] else buf[t["gb"]]
                if hermitian and jnp.iscomplexobj(buf):
                    b = jnp.conj(b)
                if update_dtype is not None:
                    a = a.astype(update_dtype)
                    b = b.astype(update_dtype)
                W = jnp.einsum(
                    "bij,bkj->bik", a, b,
                    preferred_element_type=buf.dtype,
                    precision=K.matmul_precision(),
                ).astype(buf.dtype)
                buf = buf.at[t["gd"]].add(-W)
        return buf

    jfn = jax.jit(seg_fact, donate_argnums=(0,))
    tabs_dev = jax.device_put(
        [{k: v for k, v in t.items() if k not in ("tr", "tc", "cols", "gk")}
         for t in seg.tables]
    )
    return lambda buf: jfn(buf, tabs_dev)


def build_segment_fact_fn_ldlt(layout: SolverLayout, seg: OOCSegment,
                               hermitian: bool = False, update_dtype=None):
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
                inv_p = dinv[t["tcpos"]]
                if hermitian and jnp.iscomplexobj(buf):
                    inv_p = jnp.conj(inv_p)
                panels = jnp.einsum(
                    "bij,bkj->bik", buf[t["tp"]], inv_p,
                    preferred_element_type=buf.dtype,
                    precision=K.matmul_precision(),
                ) / d_arr[t["tc"]][:, None, :]
                buf = buf.at[t["tp"]].set(panels)
            if t["ga"].shape[0]:
                a = buf[t["ga"]] * d_arr[t["gk"]][:, None, :]
                b = buf[t["gb"]]
                if hermitian and jnp.iscomplexobj(buf):
                    b = jnp.conj(b)
                if update_dtype is not None:
                    a = a.astype(update_dtype)
                    b = b.astype(update_dtype)
                W = jnp.einsum(
                    "bij,bkj->bik", a, b,
                    preferred_element_type=buf.dtype,
                    precision=K.matmul_precision(),
                ).astype(buf.dtype)
                buf = buf.at[t["gd"]].add(-W)
        return buf, d_arr, npiv

    jfn = jax.jit(seg_fact, donate_argnums=(0, 1, 2))
    tabs_dev = jax.device_put(
        [{k: v for k, v in t.items() if k not in ("tr",)}
         for t in seg.tables]
    )
    # gk = source block column of each gemm triple (host-built per segment)
    return lambda buf, d_arr, npiv, eps: jfn(buf, d_arr, npiv, eps, tabs_dev)


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
                layout, seg, hermitian=hermitian, update_dtype=update_dtype
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
                layout, seg, hermitian=hermitian, update_dtype=update_dtype
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


def solve_ooc(
    layout: SolverLayout,
    plan: OOCPlan,
    host_pool: np.ndarray,
    b_blocks: np.ndarray,
    hermitian: bool = True,
    d: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Streamed solve: forward over segments, then backward.

    With ``d`` (the LDL^T pivots, (nbc, T)): unit-diagonal sweeps with the
    D scaling applied between them — the streamed twin of solve.py's
    solve_ldlt."""
    unit = d is not None
    y = jnp.asarray(b_blocks)
    fns = []
    cache = "_solve_fns_unit" if unit else "_solve_fns"
    for seg in plan.segments:
        f = getattr(seg, cache, None)
        if f is None:
            f = build_segment_solve_fns(
                layout, seg, hermitian=hermitian, unit=unit
            )
            setattr(seg, cache, f)
        fns.append(f)
    for seg, (fwd, _) in zip(plan.segments, fns):
        win = jnp.asarray(host_pool[seg.win])
        y = fwd(win, y)
    if unit:
        y = y / jnp.asarray(d)[..., None]
    for seg, (_, bwd) in zip(reversed(plan.segments), reversed(fns)):
        win = jnp.asarray(host_pool[seg.win])
        y = bwd(win, y)
    return np.asarray(y)
