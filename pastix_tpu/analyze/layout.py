"""SolverLayout: flat static index tables for the jitted factorization.

The SolverMatrix analog (reference ``solverMatrixGen.c`` output: local
blocks + per-thread static task lists — SURVEY.md section 2 row 7).  Here
the "task lists" are per-level index tables:

  level l:  diag[l]   — pool indices of diagonal tiles to factor (batch)
            trsm[l]   — (panel tile, its diagonal tile) pairs (batch)
            gemm[l]   — (pa, pb, pd, K) triples: pool[pd] -= op(pool[pa],
                        pool[pb]) for source column K (batch + scatter-add)

and the solve sweeps reuse trsm-style tables with (row, col) companions.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Optional

import numpy as np
import scipy.sparse as sp

from pastix_tpu.analyze.blocksym import tile_symbolic


@dataclasses.dataclass
class LevelTables:
    cols: np.ndarray  # int32[nc] block-columns in this level
    diag: np.ndarray  # int32[nc] pool idx of their diagonal tiles
    trsm_panel: np.ndarray  # int32[nt] pool idx of off-diag tiles
    trsm_diag: np.ndarray  # int32[nt] pool idx of the column's diag tile
    trsm_row: np.ndarray  # int32[nt] block-row I of each panel tile
    trsm_col: np.ndarray  # int32[nt] block-col J of each panel tile
    gemm_a: np.ndarray  # int32[ng] pool idx of L(I,K)
    gemm_b: np.ndarray  # int32[ng] pool idx of L(J,K)
    gemm_d: np.ndarray  # int32[ng] pool idx of target (I,J)
    gemm_k: np.ndarray  # int32[ng] source block-column K
    gemm_nondiag: np.ndarray  # bool[ng] target is off-diagonal (for LU U-path)


@dataclasses.dataclass
class SolverLayout:
    """Static plan + pool geometry for one sparsity pattern."""

    n: int
    T: int
    nbc: int  # number of block rows/cols (= padded n / T)
    npool: int  # number of stored tiles (lower incl. diag)
    keys: np.ndarray  # int64[npool] sorted tile keys (col*nbc + row)
    blk_row: np.ndarray  # int64[npool]
    blk_col: np.ndarray  # int64[npool]
    level_of_col: np.ndarray  # int64[nbc]
    levels: list  # list[LevelTables]
    # A-value scatter plan (rebuilt values fast for pattern-reuse API):
    scat_pool_flat: np.ndarray  # int64[nnz_lo] flat index into pool for tril(A)
    scat_vals_order: np.ndarray  # int64[nnz_lo] permutation of tril(A).data
    scat_pool_flat_u: Optional[np.ndarray]  # for LU: triu(A) into Ut pool
    scat_vals_order_u: Optional[np.ndarray]
    diag_pad_flat: np.ndarray  # int64[npad] identity positions for padding
    nnz_l_tiles: int = 0

    @property
    def pool_shape(self):
        return (self.npool, self.T, self.T)

    def lookup(self, I: np.ndarray, J: np.ndarray) -> np.ndarray:
        """Vectorized tile (I,J) -> pool index (must exist)."""
        key = np.asarray(J, dtype=np.int64) * self.nbc + np.asarray(I, dtype=np.int64)
        pos = np.searchsorted(self.keys, key)
        if np.any(self.keys[np.minimum(pos, self.npool - 1)] != key):
            raise KeyError("tile not present in pattern")
        return pos

    # --- cost/report helpers -------------------------------------------

    def padded_flops(self, kind: str = "llt") -> float:
        """Device flops actually executed (uniform T x T tiles)."""
        T = float(self.T)
        nd = float(self.nbc)
        ntr = float(sum(lv.trsm_panel.size for lv in self.levels))
        ngm = float(sum(lv.gemm_a.size for lv in self.levels))
        potrf = nd * (T**3 / 3.0)
        trsm = ntr * T**3
        gemm = ngm * 2.0 * T**3
        total = potrf + trsm + gemm
        if kind == "lu":
            total = 2 * potrf + 2 * trsm + 2 * gemm
        return total

    def memory_bytes(self, dtype_bytes: int = 4, lu: bool = False) -> int:
        pool = self.npool * self.T * self.T * dtype_bytes
        tables = sum(
            lv.diag.nbytes
            + lv.trsm_panel.nbytes * 4
            + lv.gemm_a.nbytes * 4
            for lv in self.levels
        )
        return pool * (2 if lu else 1) + tables


def build_layout(
    pattern: sp.csc_matrix,
    T: int,
    for_lu: bool = False,
    schur_first_bcol: int | None = None,
    incomplete: bool = False,
    level_of_fill: int = 1,
) -> SolverLayout:
    """Build the static plan from the *permuted* full symmetric pattern.

    ``schur_first_bcol``: block columns >= this are *not* factored (no DIAG/
    TRSM tasks and no updates generated from them) but still receive
    trailing updates — after factorization their tiles hold the Schur
    complement (reference: Schur mode stops before the terminal supernode,
    SURVEY.md section 2 row 16).
    """
    n = pattern.shape[0]
    if incomplete:
        from pastix_tpu.analyze.blocksym import tile_symbolic_ilu

        blk_row, blk_col, level_of_col, nbc = tile_symbolic_ilu(
            pattern, T, level_of_fill
        )
    else:
        blk_row, blk_col, level_of_col, nbc = tile_symbolic(pattern, T)
    keys = blk_col * np.int64(nbc) + blk_row
    # tile_symbolic emits sorted by (col,row) already; assert & keep
    assert np.all(np.diff(keys) > 0)
    npool = keys.shape[0]

    def lookup(I, J):
        key = np.asarray(J, dtype=np.int64) * nbc + np.asarray(I, dtype=np.int64)
        pos = np.searchsorted(keys, key)
        assert np.all(keys[np.minimum(pos, npool - 1)] == key)
        return pos.astype(np.int64)

    col_ptr = np.searchsorted(blk_col, np.arange(nbc + 1))
    diag_of_col = lookup(np.arange(nbc), np.arange(nbc))

    skip_from = schur_first_bcol if schur_first_bcol is not None else nbc
    active = np.arange(nbc) < skip_from
    nlev = (
        int(level_of_col[active].max()) + 1 if np.any(active) else 0
    )
    levels: list[LevelTables] = []
    for lev in range(nlev):
        cols = np.flatnonzero((level_of_col == lev) & active).astype(np.int64)
        if cols.size == 0:
            continue
        diag = diag_of_col[cols]
        tp_list, td_list, tr_list, tc_list = [], [], [], []
        ga_list, gb_list, gd_list, gk_list = [], [], [], []
        for J in cols:
            lo, hi = col_ptr[J], col_ptr[J + 1]
            rows = blk_row[lo + 1 : hi]  # off-diagonal block rows (sorted)
            m = rows.size
            if m == 0:
                continue
            pidx = np.arange(lo + 1, hi, dtype=np.int64)
            tp_list.append(pidx)
            td_list.append(np.full(m, diag_of_col[J]))
            tr_list.append(rows)
            tc_list.append(np.full(m, J))
            # updates: all pairs I >= K from rows
            ii, kk = np.tril_indices(m)
            I = rows[ii]
            K = rows[kk]
            if incomplete:
                # ILU: updates whose target tile was dropped are discarded
                key = K.astype(np.int64) * nbc + I.astype(np.int64)
                pos = np.searchsorted(keys, key)
                hit = keys[np.minimum(pos, npool - 1)] == key
                ii, kk, I, K = ii[hit], kk[hit], I[hit], K[hit]
            ga_list.append(pidx[ii])
            gb_list.append(pidx[kk])
            gd_list.append(lookup(I, K))
            gk_list.append(np.full(I.size, J))
        cat = lambda lst: (
            np.concatenate(lst).astype(np.int32) if lst else np.empty(0, np.int32)
        )
        ga, gb, gd, gk = cat(ga_list), cat(gb_list), cat(gd_list), cat(gk_list)
        nondiag = (
            blk_row[gd] != blk_col[gd] if gd.size else np.empty(0, bool)
        )
        levels.append(
            LevelTables(
                cols=cols.astype(np.int32),
                diag=diag.astype(np.int32),
                trsm_panel=cat(tp_list),
                trsm_diag=cat(td_list),
                trsm_row=cat(tr_list),
                trsm_col=cat(tc_list),
                gemm_a=ga,
                gemm_b=gb,
                gemm_d=gd,
                gemm_k=gk,
                gemm_nondiag=np.asarray(nondiag, dtype=bool),
            )
        )

    # --- A-value scatter plan ------------------------------------------
    A = sp.coo_matrix(sp.tril(pattern))  # pattern only; values applied later
    # lower part incl diag goes to the L pool
    li, lj = A.row.astype(np.int64), A.col.astype(np.int64)
    pool_idx = lookup(li // T, lj // T)
    scat_pool_flat = pool_idx * (T * T) + (li % T) * T + (lj % T)
    scat_vals_order = np.arange(li.size, dtype=np.int64)  # tril order

    scat_u = scat_u_ord = None
    if for_lu:
        Au = sp.coo_matrix(sp.triu(pattern, k=1))
        ui, uj = Au.row.astype(np.int64), Au.col.astype(np.int64)
        # U(i,j), i<j stored transposed in Ut tile (J_blk=j//T? no:
        # Ut(Ib, Jb) = U(Jb, Ib)^T, so entry (i,j) -> tile (j//T, i//T),
        # local position (j%T, i%T)  [transposed]
        pu = lookup(uj // T, ui // T)
        scat_u = pu * (T * T) + (uj % T) * T + (ui % T)
        scat_u_ord = np.arange(ui.size, dtype=np.int64)

    # padded diagonal identity (rows n..nbc*T-1)
    pad = np.arange(n, nbc * T, dtype=np.int64)
    pdiag = diag_of_col[pad // T]
    diag_pad_flat = pdiag * (T * T) + (pad % T) * T + (pad % T)

    return SolverLayout(
        n=n,
        T=T,
        nbc=nbc,
        npool=npool,
        keys=keys,
        blk_row=blk_row,
        blk_col=blk_col,
        level_of_col=level_of_col,
        levels=levels,
        scat_pool_flat=scat_pool_flat,
        scat_vals_order=scat_vals_order,
        scat_pool_flat_u=scat_u,
        scat_vals_order_u=scat_u_ord,
        diag_pad_flat=diag_pad_flat,
        nnz_l_tiles=npool,
    )
