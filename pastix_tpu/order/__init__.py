"""Ordering phase (reference phase 1: pastix_task_scotch — SURVEY.md §1/§2).

Dispatch over OrderingMethod; all methods return an :class:`Order` whose
rangtab is a first-cut supernode partition (refined by the symbolic phase).
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp
from scipy.sparse import csgraph

from pastix_tpu.config import OrderingMethod, PastixConfig
from pastix_tpu.order.structs import Order
from pastix_tpu.order.etree import (
    etree,
    postorder,
    col_counts,
    tree_levels,
    fundamental_supernodes,
    amalgamate,
)
from pastix_tpu.order.nd import nested_dissection
from pastix_tpu.order.mmd import minimum_degree

__all__ = [
    "Order",
    "compute_ordering",
    "etree",
    "postorder",
    "col_counts",
    "tree_levels",
    "fundamental_supernodes",
    "amalgamate",
    "nested_dissection",
    "minimum_degree",
]


def compute_ordering(
    pattern: sp.csc_matrix,
    config: PastixConfig | None = None,
    method: OrderingMethod | None = None,
    user_perm: np.ndarray | None = None,
) -> Order:
    """Compute a fill-reducing ordering of a full symmetric pattern.

    ``pattern`` must be the symmetrized boolean pattern with diagonal
    (SparseMatrix.pattern_sym_scipy()).
    """
    config = config or PastixConfig()
    method = method or config.ordering
    n = pattern.shape[0]

    if method == OrderingMethod.PERSONAL:
        if user_perm is None:
            raise ValueError("PERSONAL ordering requires user_perm")
        permtab = np.asarray(user_perm, dtype=np.int64)
        peritab = np.empty(n, dtype=np.int64)
        peritab[permtab] = np.arange(n, dtype=np.int64)
        return Order(permtab, peritab, np.array([0, n], dtype=np.int64))

    if method == OrderingMethod.NATURAL:
        return Order.identity(n)

    if method == OrderingMethod.ND:
        # native (C++) nested dissection when the toolchain is available;
        # same algorithm in Python otherwise
        from pastix_tpu.native import native_nested_dissection

        res = native_nested_dissection(
            pattern, leaf_size=config.nd_leaf_size,
            max_levels=config.nd_max_levels,
        )
        if res is not None:
            peritab, rangtab = res
            permtab = np.empty(n, dtype=np.int64)
            permtab[peritab] = np.arange(n, dtype=np.int64)
            return Order(permtab, peritab, rangtab)
        return nested_dissection(
            pattern, leaf_size=config.nd_leaf_size, max_levels=config.nd_max_levels
        )

    if method == OrderingMethod.AMD:
        peritab = minimum_degree(pattern)
        permtab = np.empty(n, dtype=np.int64)
        permtab[peritab] = np.arange(n, dtype=np.int64)
        return Order(permtab, peritab, np.array([0, n], dtype=np.int64))

    if method == OrderingMethod.RCM:
        peritab = csgraph.reverse_cuthill_mckee(
            sp.csr_matrix(pattern), symmetric_mode=True
        ).astype(np.int64)
        permtab = np.empty(n, dtype=np.int64)
        permtab[peritab] = np.arange(n, dtype=np.int64)
        return Order(permtab, peritab, np.array([0, n], dtype=np.int64))

    raise ValueError(f"unsupported ordering method: {method}")
