"""Half-packed E2 plan: packed a-side rows x grid b-tiles, row scatter.

The uniform tile grid is kept as *storage* (coefinit, solve sweeps, Schur
and the dense tail are unchanged), but the panel TRSM + trailing-update
GEMMs — ~90% of factorization flops — are recast over each block column's
*packed* scalar row support instead of grid tiles:

  * per block column K the host records its below-diagonal scalar row
    support supp(K) (sorted), chopped into mh = ceil(h/T) packed T-row
    chunks;
  * per elimination level the device gathers the chunks from the tile pool
    (one row-gather), applies the panel TRSM on packed rows (one MXU
    matmul per chunk instead of per grid tile), and writes the rows back;
  * the trailing updates pair each packed a-chunk with a *grid* b-tile of
    the same panel: W = O_a @ B^T has full 128-lane rows addressed to one
    target tile row each, so the extend-add is a ROW-granular scatter
    (p2.at[(ng,T) rows].add) — measured at tile-scatter speed on the v5e,
    whereas element-granular scatter runs ~8x slower (exp_scatter.py).

Useful GEMM flops per update become 2*h*m*T^2 (+ chunk-pad fringe)
instead of 2*(m*T)^2*T over grid tile pairs — the saving is the row-fill
efficiency h/(m*T) (~0.31 on 3D Poisson at T=128, i.e. ~3x fewer device
flops and ~3x less scatter traffic).  The b-side stays on the grid: its
off-support rows are structurally zero, contributing zero columns.

This replaces the reference's per-block E2 task list (sopalin_smp,
src/sopalin/src/sopalin3d.c) at packed-supernode granularity — the
reference's coeftab storage is itself packed by row intervals; the tile
grid here is the TPU-friendly rectangularization of the same idea.

Out-of-bounds conventions (JAX scatter drops, gather clamps):
  * pad rows inside a chunk point tbr at the TBcat sentinel, whose value
    is npool, so their dst row is >= npool*T -> dropped;
  * upper cross-tile pairs (row's tile above the b-tile) have TBcat ==
    npool -> dropped; same-tile rows scatter their full row into the
    diagonal tile, whose upper triangle the factorization never reads
    (LLT/LDLT tril the diag; for LU the upper part IS the U update);
  * pad chunks / pad pairs gather junk and scatter nowhere.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np
import scipy.sparse as sp

from pastix_tpu.analyze.layout import SolverLayout


def scalar_supports(pat: sp.csc_matrix, T: int, nbc: int) -> list:
    """Per-block-column union scalar row support of L, strictly below the
    diagonal block — block-column-granular column-merge symbolic (the
    scalar refinement of blocksym.tile_symbolic's quotient fill)."""
    A = sp.coo_matrix(sp.tril(pat, -1))
    order = np.argsort(
        (A.col // T).astype(np.int64) * np.int64(nbc) * T + A.row, kind="stable"
    )
    r, c = A.row[order], (A.col[order] // T)
    ptr = np.searchsorted(c, np.arange(nbc + 1))
    pending: list = [[] for _ in range(nbc)]
    supports: list = [None] * nbc
    for J in range(nbc):
        base = r[ptr[J] : ptr[J + 1]]
        parts = pending[J] + [base]
        supp = (
            np.unique(np.concatenate(parts)) if len(parts) > 1 else np.unique(base)
        )
        supp = supp[supp >= (J + 1) * T]
        pending[J] = None
        supports[J] = supp.astype(np.int64)
        if supp.size:
            parent = int(supp[0] // T)
            pending[parent].append(supp)
    return supports


@dataclasses.dataclass
class PackedLevel:
    """Per-level packed tables (all numpy; last chunk row is the pad chunk)."""

    nchunk: int  # real chunks (pad chunk excluded)
    gidx: np.ndarray  # (nchunk+1, T) row-gather indices into pool2d
    cpos: np.ndarray  # (nchunk+1,) chunk's column position in the level batch
    ccol: np.ndarray  # (nchunk+1,) chunk's block column (LDLT d-scaling)
    tbr: np.ndarray  # (nchunk+1, T) per-row TBcat row offsets
    rloc: np.ndarray  # (nchunk+1, T) row position within the target tile
    pa: np.ndarray  # (ng,) pair a-chunk (level-local index)
    ptb: np.ndarray  # (ng,) pair b-tile, local index within the column
    pgb: np.ndarray  # (ng,) pair b-tile pool index (grid gather)


@dataclasses.dataclass
class PackedPlan:
    T: int
    npool: int
    tbcat: np.ndarray  # int32 tile-pair -> pool idx (OOB = npool); [-1] sentinel
    tbcat_u: Optional[np.ndarray]  # LU U-side variant (diag pairs OOB'd)
    levels: list  # list[PackedLevel], aligned with the factorization levels

    def gemm_flops(self) -> float:
        T = float(self.T)
        ng = sum(lv.pa.size for lv in self.levels)
        return 2.0 * ng * T**3

    def trsm_flops(self) -> float:
        T = float(self.T)
        nc = sum(lv.nchunk for lv in self.levels)
        return 2.0 * nc * T**3


def build_packed_plan(
    layout: SolverLayout,
    pattern_ext: sp.csc_matrix,
    levels: Optional[list] = None,
    supports: Optional[list] = None,
    for_lu: bool = False,
) -> PackedPlan:
    """Build the half-packed E2 plan for ``levels`` (default: layout.levels;
    the dense-tail path passes its filtered levels_lo)."""
    T, nbc, npool = layout.T, layout.nbc, layout.npool
    if levels is None:
        levels = layout.levels
    if supports is None:
        supports = scalar_supports(pattern_ext, T, nbc)

    keys = layout.keys

    def lookup_safe(I, J):
        key = np.asarray(J, dtype=np.int64) * nbc + np.asarray(I, dtype=np.int64)
        pos = np.searchsorted(keys, key)
        posc = np.minimum(pos, npool - 1)
        out = np.where(keys[posc] == key, posc, npool)
        return out.astype(np.int64)

    # --- per-column chunk metadata + TBcat blocks -----------------------
    # only columns that appear in some level with off-diag support need one
    active = np.zeros(nbc, dtype=bool)
    for lv in levels:
        active[lv.cols] = True

    tb_blocks = []
    tb_off = np.full(nbc, -1, dtype=np.int64)
    col_meta: list = [None] * nbc
    off = 0
    for Kcol in range(nbc):
        if not active[Kcol]:
            continue
        supp = supports[Kcol]
        h = supp.size
        if h == 0:
            continue
        tiles = np.unique(supp // T)
        m = tiles.size
        ti = np.searchsorted(tiles, supp // T).astype(np.int64)
        rloc = (supp % T).astype(np.int64)
        prow = lookup_safe(supp // T, np.full(h, Kcol)) * T + rloc
        # TB block (m+1)^2: [a, b] = pool idx of tile (tiles[a], tiles[b])
        # for a >= b, OOB (npool) above and in the sentinel row/col m
        TB = np.full(((m + 1), (m + 1)), npool, dtype=np.int64)
        ai, bi = np.tril_indices(m)
        TB[ai, bi] = lookup_safe(tiles[ai], tiles[bi])
        tb_blocks.append(TB.ravel())
        tb_off[Kcol] = off
        off += (m + 1) * (m + 1)
        mh = -(-h // T)
        pgb_col = lookup_safe(tiles, np.full(m, Kcol))
        col_meta[Kcol] = (supp, prow, ti, rloc, m, mh, pgb_col)
    tbcat = (
        np.concatenate(tb_blocks + [np.asarray([npool], np.int64)])
        if tb_blocks
        else np.asarray([npool], np.int64)
    )
    sentinel = tbcat.size - 1

    OOB_ROW = npool * T
    assert (npool + 1) * T <= np.iinfo(np.int32).max, (
        "tile pool too large for int32 row indexing"
    )

    plevels = []
    for lv in levels:
        g_list, cp_list, cc_list, tbr_list, rl_list = [], [], [], [], []
        pa_list, ptb_list, pgb_list = [], [], []
        c0 = 0
        for pos, Kcol in enumerate(lv.cols):
            meta = col_meta[Kcol]
            if meta is None:
                continue
            supp, prow, ti, rloc, m, mh, pgb_col = meta
            h = supp.size
            pad = mh * T - h

            def padded(a, fill):
                return np.concatenate([a, np.full(pad, fill, np.int64)])

            g_list.append(padded(prow, OOB_ROW).reshape(mh, T))
            tbr_list.append(
                padded(tb_off[Kcol] + ti * (m + 1), sentinel).reshape(mh, T)
            )
            rl_list.append(padded(rloc, 0).reshape(mh, T))
            cp_list.append(np.full(mh, pos, np.int64))
            cc_list.append(np.full(mh, Kcol, np.int64))
            # pairs: chunk c x local b-tile tb for tb = 0 .. ti_last(c)
            last = np.minimum((np.arange(mh) + 1) * T, h) - 1
            nb = ti[last] + 1  # pairs per chunk
            pa_list.append(c0 + np.repeat(np.arange(mh), nb))
            ptb = np.concatenate([np.arange(k) for k in nb]) if mh else (
                np.empty(0, np.int64)
            )
            ptb_list.append(ptb)
            pgb_list.append(pgb_col[ptb])
            c0 += mh

        nchunk = c0
        pad_g = np.full((1, T), OOB_ROW, np.int64)
        pad_tbr = np.full((1, T), sentinel, np.int64)
        pad_z = np.zeros((1, T), np.int64)

        def cat2(lst, padrow):
            return np.concatenate(lst + [padrow]) if lst else padrow

        gidx = cat2(g_list, pad_g)
        tbr = cat2(tbr_list, pad_tbr)
        rl = cat2(rl_list, pad_z)
        cpos = (
            np.concatenate(cp_list + [np.zeros(1, np.int64)])
            if cp_list
            else np.zeros(1, np.int64)
        )
        ccol = (
            np.concatenate(cc_list + [np.full(1, nbc, np.int64)])
            if cc_list
            else np.full(1, nbc, np.int64)
        )
        cat1 = lambda lst: (
            np.concatenate(lst) if lst else np.empty(0, np.int64)
        )
        plevels.append(
            PackedLevel(
                nchunk=nchunk,
                gidx=gidx.astype(np.int32),
                cpos=cpos.astype(np.int32),
                ccol=ccol.astype(np.int32),
                tbr=tbr.astype(np.int32),
                rloc=rl.astype(np.int32),
                pa=cat1(pa_list).astype(np.int32),
                ptb=cat1(ptb_list).astype(np.int32),
                pgb=cat1(pgb_list).astype(np.int32),
            )
        )

    tbcat_u = None
    if for_lu:
        # U-side scatter: same pair table with diagonal tile-pairs dropped
        # (the L-side (T,T) product already covers the combined diag tile's
        # upper/U part, see factorize's LU packed body)
        tbcat_u = tbcat.copy()
        for Kcol in range(nbc):
            if tb_off[Kcol] < 0 or col_meta[Kcol] is None:
                continue
            m = col_meta[Kcol][4]
            base = tb_off[Kcol]
            diag_pos = base + np.arange(m) * (m + 1) + np.arange(m)
            tbcat_u[diag_pos] = npool
        tbcat_u = tbcat_u.astype(np.int32)

    return PackedPlan(
        T=T,
        npool=npool,
        tbcat=tbcat.astype(np.int32),
        tbcat_u=tbcat_u,
        levels=plevels,
    )
