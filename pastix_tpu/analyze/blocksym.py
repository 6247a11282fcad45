"""Tile-level symbolic factorization and level scheduling.

Block-quotient symbolic factorization: treat each T x T tile as one scalar
and run the classic column-merge fill computation.  The resulting pattern
is a superset of the exact scalar fill at tile granularity and is closed
under right-looking updates (if tiles (I,K) and (J,K) exist with I>=J>K
then (I,J) exists), which is exactly what the batched GEMM tables require.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp


def tile_pattern_of_a(pattern: sp.csc_matrix, T: int) -> tuple[np.ndarray, np.ndarray, int]:
    """Lower-triangular tile pattern of A: returns (tile_rows, tile_cols, nbc)."""
    n = pattern.shape[0]
    nbc = -(-n // T)
    A = sp.coo_matrix(sp.tril(pattern))
    I = A.row // T
    J = A.col // T
    key = np.unique(J.astype(np.int64) * nbc + I.astype(np.int64))
    # ensure all diagonal tiles are present (padding identity lives there)
    dk = np.arange(nbc, dtype=np.int64) * nbc + np.arange(nbc, dtype=np.int64)
    key = np.unique(np.concatenate([key, dk]))
    return (key % nbc).astype(np.int64), (key // nbc).astype(np.int64), nbc


def tile_symbolic(
    pattern: sp.csc_matrix, T: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray, int]:
    """Tile-level fill pattern of L and level schedule.

    Returns (blk_row, blk_col, level_of_col, nbc) with blocks sorted by
    (col, row); (J,J) diagonal tiles included.
    """
    tI, tJ, nbc = tile_pattern_of_a(pattern, T)

    # column-merge symbolic on the tile graph
    cols: list[np.ndarray] = [None] * nbc  # type: ignore
    order_idx = np.argsort(tJ * np.int64(nbc) + tI, kind="stable")
    tI, tJ = tI[order_idx], tJ[order_idx]
    ptr = np.searchsorted(tJ, np.arange(nbc + 1))
    pending: list[list[np.ndarray]] = [[] for _ in range(nbc)]
    out_rows: list[np.ndarray] = []
    level = np.zeros(nbc, dtype=np.int64)
    for J in range(nbc):
        base = tI[ptr[J] : ptr[J + 1]]
        parts = pending[J]
        parts.append(base)
        rows = np.unique(np.concatenate(parts)) if len(parts) > 1 else np.unique(base)
        pending[J] = []
        # rows[0] == J (diagonal tile always present)
        out_rows.append(rows)
        off = rows[1:]
        if off.size:
            parent = int(off[0])
            pending[parent].append(off)
            # level propagation: every I with tile (I,J) depends on column J
            np.maximum.at(level, off, level[J] + 1)
    blk_row = np.concatenate(out_rows)
    blk_col = np.repeat(
        np.arange(nbc, dtype=np.int64), [r.size for r in out_rows]
    )
    return blk_row, blk_col, level, nbc
