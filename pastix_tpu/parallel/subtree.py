"""Proportional subtree mapping — the blend distribPart/cand analog.

The reference assigns elimination-tree subtrees to processor sets by
proportional mapping of subtree costs (``src/blend/src/distribPart.c``,
``cand.c`` — SURVEY.md §2 row 7): independent subtrees factor with no
communication; only the shared top of the tree is cooperative.

Here the same structure maps onto the ``tp`` mesh axis:

  * the tile-column elimination tree is costed (potrf+trsm+gemm flops per
    block column) and subtrees are proportionally assigned to devices;
  * the **local phase** runs every device's own subtree columns from its
    stacked (per-device padded) task tables — zero collectives; GEMM
    contributions aimed at shared (ancestor) columns accumulate into a
    boundary buffer;
  * one ``psum`` merges the boundary contributions (the single fan-in
    exchange), then the **shared phase** factors the remaining top
    columns with the bulk-synchronous scheme;
  * a final masked ``psum`` reconciles the replicated pool (each tile has
    exactly one writer).

Compared to the flat per-level partition (sharded.py), the local phase
trades one psum per level for one total — the ICI traffic of the whole
bottom of the tree collapses to a single boundary exchange.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from pastix_tpu.analyze.layout import SolverLayout
from pastix_tpu.numeric import kernels as K


def _column_tree_and_costs(layout: SolverLayout):
    """Tile-column etree (parent = first off-diag tile's column) + flop cost
    per block column."""
    nbc, T = layout.nbc, layout.T
    parent = np.full(nbc, -1, dtype=np.int64)
    cost = np.full(nbc, float(T) ** 3 / 3.0)  # potrf
    # per-column tile lists from the sorted (col,row) keys
    col_ptr = np.searchsorted(layout.blk_col, np.arange(nbc + 1))
    for j in range(nbc):
        lo, hi = col_ptr[j], col_ptr[j + 1]
        rows = layout.blk_row[lo + 1 : hi]
        m = rows.size
        if m:
            parent[j] = rows[0]
            cost[j] += m * float(T) ** 3  # trsm
            cost[j] += (m * (m + 1) / 2) * 2.0 * float(T) ** 3  # gemm
    return parent, cost


def proportional_mapping(layout: SolverLayout, ndev: int):
    """Assign block columns to devices; returns (owner[nbc], shared mask).

    owner[j] = device for subtree-local columns, -1 for shared columns
    (columns whose candidate device set has more than one device).
    """
    nbc = layout.nbc
    parent, cost = _column_tree_and_costs(layout)
    subtree = cost.copy()
    # accumulate subtree costs bottom-up (columns are topologically ordered:
    # parent > child by construction of the ND ordering)
    for j in range(nbc):
        if parent[j] != -1:
            subtree[parent[j]] += subtree[j]
    children: list[list[int]] = [[] for _ in range(nbc)]
    roots = []
    for j in range(nbc):
        if parent[j] == -1:
            roots.append(j)
        else:
            children[parent[j]].append(j)

    owner = np.full(nbc, -1, dtype=np.int64)

    def assign(nodes, devs):
        """Proportionally split device list among the subtrees in nodes."""
        stack = [(nodes, devs)]
        while stack:
            nodes, devs = stack.pop()
            if len(devs) == 1:
                d = devs[0]
                # entire subtrees become local to d
                st = list(nodes)
                while st:
                    u = st.pop()
                    owner[u] = d
                    st.extend(children[u])
                continue
            # multi-device: the nodes themselves stay shared; split their
            # children proportionally
            kids = []
            for u in nodes:
                owner[u] = -1
                kids.extend(children[u])
            if not kids:
                continue
            kids.sort(key=lambda u: -subtree[u])
            total = sum(subtree[u] for u in kids) or 1.0
            # greedy proportional split of devices over child subtrees
            share = [0.0] * len(devs)
            buckets: list[list[int]] = [[] for _ in devs]
            for u in kids:
                i = int(np.argmin(share))
                buckets[i].append(u)
                share[i] += subtree[u]
            for i, b in enumerate(buckets):
                if b:
                    stack.append((b, [devs[i]]))
            # note: each bucket gets exactly one device here (top-level
            # separators above the cut were already marked shared); deeper
            # multi-device splits happen when ndev > number of top subtrees
        return

    # walk down from the roots until the frontier subtrees are both
    # numerous enough AND fine-grained enough for balanced greedy
    # binning: any subtree above total/(2*ndev) keeps splitting (its own
    # columns become shared).  Stopping at len(frontier) >= ndev alone
    # measured 250-1300% local imbalance on the 50k dryrun — the top two
    # separes' subtrees dominate everything.
    frontier = list(roots)
    total = sum(subtree[u] for u in frontier) or 1.0
    grain = total / (2.0 * ndev)
    while frontier:
        split = [
            u for u in frontier if children[u] and subtree[u] > grain
        ]
        if len(frontier) >= ndev and not split:
            break
        if not split:
            break
        split_set = set(split)
        nxt = []
        for u in frontier:
            if u in split_set:
                owner[u] = -1
                nxt.extend(children[u])
            else:
                nxt.append(u)
        frontier = nxt
    assign(frontier, list(range(ndev)))
    return owner


def subtree_report(layout: SolverLayout, ndev: int) -> dict:
    """Static balance/comm accounting for the proportional subtree plan
    (the distribPart strategy's analog of owner.distribution_report —
    VERDICT r4 item: scaling evidence for >=2 dist strategies).

    Per-device local-phase flops (each device's own subtrees), the
    cooperative shared-top flop fraction, and the boundary psum volume
    (tiles in shared columns that local updates contribute into — the
    single fan-in exchange's per-device bytes)."""
    parent, cost = _column_tree_and_costs(layout)
    owner = proportional_mapping(layout, ndev)
    local = np.zeros(ndev, np.float64)
    for d in range(ndev):
        local[d] = cost[owner == d].sum()
    shared_cost = float(cost[owner == -1].sum())
    shared_cols = np.flatnonzero(owner == -1)
    is_shared = np.isin(layout.blk_col, shared_cols)
    # boundary = shared-column tiles targeted by local-phase updates
    bt = []
    for lv in layout.levels:
        if lv.gemm_d.size and (owner[np.asarray(lv.cols)] >= 0).any():
            g = np.asarray(lv.gemm_d)
            bt.append(np.unique(g[is_shared[g]]))
    nb = np.unique(np.concatenate(bt)).size if bt else 0
    tot = local.sum() + shared_cost
    return {
        "ndev": ndev,
        "local_flops": local,
        "shared_flops": shared_cost,
        "shared_frac": shared_cost / max(tot, 1.0),
        "local_imbalance": float(
            local.max() / max(local.mean(), 1.0) - 1.0
        ),
        "boundary_tiles": nb,
        "boundary_bytes": nb * layout.T * layout.T * 4,
    }


def _local_tables(layout: SolverLayout, owner: np.ndarray, ndev: int):
    """Per-level stacked (device-major) tables for the local phase, plus the
    boundary-tile fan-in plan and the pool ownership mask."""
    nbc, npool = layout.nbc, layout.npool
    shared_cols = np.flatnonzero(owner == -1)
    is_shared_col = owner == -1

    # boundary tiles: tiles in shared columns hit by local-phase updates
    btiles = []
    per_level = []
    for lv in layout.levels:
        loc_mask = ~is_shared_col[lv.cols]
        if not loc_mask.any():
            per_level.append(None)
            continue
        g_shared = (
            is_shared_col[layout.blk_col[lv.gemm_d]]
            if lv.gemm_d.size
            else np.empty(0, bool)
        )
        btiles.append(np.unique(lv.gemm_d[g_shared]))
        per_level.append((loc_mask, g_shared))
    boundary = (
        np.unique(np.concatenate(btiles)) if btiles else np.empty(0, np.int64)
    )
    bpos = {int(t): i for i, t in enumerate(boundary)}
    nb = boundary.size

    # per device, per level: local tables
    def pad_stack(rows, fill):
        m = max((r.size for r in rows), default=0)
        m = max(m, 1)
        out = np.full((ndev, m), fill, dtype=np.int32)
        for d, r in enumerate(rows):
            out[d, : r.size] = r
        return out

    oob = npool + nb + 1  # beyond pool+acc+junk: gathers clamp, scatters drop
    levels_out = []
    for lv, pl in zip(layout.levels, per_level):
        if pl is None:
            continue
        loc_mask, g_shared = pl
        dcols, ddiag, dtp, dtd = [], [], [], []
        dga, dgb, dgd, dbp = [], [], [], []
        col_owner_lv = owner[lv.cols]
        tp_owner = owner[lv.trsm_col] if lv.trsm_col.size else np.empty(0)
        g_owner = (
            owner[layout.blk_col[lv.gemm_b]] if lv.gemm_b.size else np.empty(0)
        )
        # gemm triple belongs to the device owning its source column (J);
        # source col of a triple is gemm_k
        g_src_owner = owner[lv.gemm_k] if lv.gemm_k.size else np.empty(0)
        dtc, dgk = [], []
        for d in range(ndev):
            cm = col_owner_lv == d
            dcols.append(lv.cols[cm])
            ddiag.append(lv.diag[cm])
            tm = tp_owner == d if tp_owner.size else np.empty(0, bool)
            dtp.append(lv.trsm_panel[tm])
            dtd.append(lv.trsm_diag[tm])
            dtc.append(lv.trsm_col[tm])
            gm = g_src_owner == d if lv.gemm_k.size else np.empty(0, bool)
            gml = gm & ~g_shared
            gms = gm & g_shared
            dga.append(np.concatenate([lv.gemm_a[gml], lv.gemm_a[gms]]))
            dgb.append(np.concatenate([lv.gemm_b[gml], lv.gemm_b[gms]]))
            dgk.append(np.concatenate([lv.gemm_k[gml], lv.gemm_k[gms]]))
            # local targets scatter into the pool; shared ones into the
            # boundary acc (encoded as npool + position)
            dgd.append(
                np.concatenate(
                    [
                        lv.gemm_d[gml],
                        np.array(
                            [npool + bpos[int(t)] for t in lv.gemm_d[gms]],
                            dtype=np.int64,
                        ),
                    ]
                )
            )
        levels_out.append(
            {
                "diag": pad_stack(ddiag, oob),
                "cols": pad_stack(dcols, nbc),
                "tp": pad_stack(dtp, oob),
                "td": pad_stack(dtd, oob),
                "tc": pad_stack(dtc, nbc),
                "ga": pad_stack(dga, 0),
                "gb": pad_stack(dgb, 0),
                "gk": pad_stack(dgk, nbc),
                # junk contributions land in the sacrificial acc slot
                "gd": pad_stack(dgd, npool + nb),
            }
        )

    # ownership mask for the final pool reconciliation: the writer of each
    # tile is the owner of its column; shared columns go to device 0 (their
    # tiles are identical everywhere after the shared phase)
    tile_owner = owner[layout.blk_col]
    mask = np.zeros((ndev, npool), dtype=np.float32)
    for d in range(ndev):
        mask[d] = (tile_owner == d) | ((tile_owner == -1) & (d == 0))
    return levels_out, boundary, mask


def _shared_split(layout: SolverLayout, owner: np.ndarray, ndev: int):
    """Shared-column sublayout + flat shard tables for the top phase."""
    from pastix_tpu.parallel.sharded import _shard_tables

    is_shared_col = owner == -1
    import dataclasses as _dc

    shared_levels = []
    for lv in layout.levels:
        cm = is_shared_col[lv.cols]
        if not cm.any():
            continue
        tm = (
            is_shared_col[lv.trsm_col] if lv.trsm_col.size
            else np.empty(0, bool)
        )
        gm = is_shared_col[lv.gemm_k] if lv.gemm_k.size else np.empty(0, bool)
        shared_levels.append(
            _dc.replace(
                lv,
                cols=lv.cols[cm], diag=lv.diag[cm],
                trsm_panel=lv.trsm_panel[tm], trsm_diag=lv.trsm_diag[tm],
                trsm_row=lv.trsm_row[tm], trsm_col=lv.trsm_col[tm],
                gemm_a=lv.gemm_a[gm], gemm_b=lv.gemm_b[gm],
                gemm_d=lv.gemm_d[gm], gemm_k=lv.gemm_k[gm],
                gemm_nondiag=lv.gemm_nondiag[gm],
            )
        )
    shared_layout = _dc.replace(layout, levels=shared_levels)
    return shared_levels, _shard_tables(shared_layout, ndev)


def build_subtree_factorize_llt(
    layout: SolverLayout, mesh: Mesh, tp_axis: str = "tp"
):
    """LL^T with proportional subtree mapping: local phase (no collectives)
    -> one boundary psum -> shared top phase -> masked pool merge."""
    ndev = mesh.shape[tp_axis]
    owner = proportional_mapping(layout, ndev)
    loc_levels, boundary, mask = _local_tables(layout, owner, ndev)
    T, npool, nb = layout.T, layout.npool, boundary.size

    # shared phase: the flat per-level scheme restricted to shared columns
    shared_levels, shared_tabs = _shared_split(layout, owner, ndev)

    def fact_local(pool):
        me = lax.axis_index(tp_axis)
        # pool extended with the boundary accumulator (+1 junk slot)
        acc = jnp.zeros((nb + 1, T, T), pool.dtype)
        buf = jnp.concatenate([pool, acc], axis=0)

        # ---- local phase: zero collectives -------------------------------
        for t in loc_levels:
            diag_idx = jnp.asarray(t["diag"])[me]
            diag = K.potrf_batch(jnp.tril(buf[diag_idx]))
            buf = buf.at[diag_idx].set(diag)
            tp = jnp.asarray(t["tp"])[me]
            panels = K.trsm_llt(buf[tp], buf[jnp.asarray(t["td"])[me]])
            buf = buf.at[tp].set(panels)
            ga = jnp.asarray(t["ga"])[me]
            gb = jnp.asarray(t["gb"])[me]
            gd = jnp.asarray(t["gd"])[me]
            contrib = jnp.einsum(
                "bij,bkj->bik", buf[ga], buf[gb],
                preferred_element_type=buf.dtype,
                precision=K.matmul_precision(),
            )
            buf = buf.at[gd].add(-contrib)

        # ---- single boundary fan-in --------------------------------------
        pool = buf[:npool]
        if nb:
            bnd = lax.psum(buf[npool : npool + nb], tp_axis)
            # boundary holds (-sum of contributions); pool rows at the
            # boundary tiles still hold A values on every device
            pool = pool.at[jnp.asarray(boundary.astype(np.int32))].add(bnd)

        # ---- shared top phase (bulk-synchronous) -------------------------
        for t in shared_tabs:
            diag = K.potrf_batch(jnp.tril(pool[t["diag"]]))
            pool = pool.at[t["diag"]].set(diag)
            if t["tp"].size:
                panels = K.trsm_llt(pool[t["tp"]], pool[t["td"]])
                pool = pool.at[t["tp"]].set(panels)
            if t["ntouch"]:
                ga = jnp.asarray(t["ga"])[me]
                gb = jnp.asarray(t["gb"])[me]
                gp = jnp.asarray(t["gp"])[me]
                contrib = jnp.einsum(
                    "bij,bkj->bik", pool[ga], pool[gb],
                    preferred_element_type=pool.dtype,
                    precision=K.matmul_precision(),
                )
                acc2 = jnp.zeros((t["ntouch"] + 1, T, T), pool.dtype)
                acc2 = acc2.at[gp].add(contrib)
                acc2 = lax.psum(acc2, tp_axis)
                pool = pool.at[t["touched"]].add(-acc2[: t["ntouch"]])

        # ---- reconcile the replicated pool (one writer per tile) ---------
        m = jnp.asarray(mask)[me][:, None, None]
        return lax.psum(pool * m, tp_axis)

    fn = jax.shard_map(
        fact_local, mesh=mesh, in_specs=P(), out_specs=P(), check_vma=False
    )
    return jax.jit(fn)


def build_subtree_factorize_ldlt(
    layout: SolverLayout, mesh: Mesh, tp_axis: str = "tp",
    hermitian: bool = False,
):
    """LDL^T with proportional subtree mapping (the LLT scheme with
    unit-lower/diagonal-pivot kernels): local subtree phase with local d
    entries, one boundary psum, shared top phase, masked pool + d merge.
    Returns fn(pool, eps) -> (pool, d, npiv)."""
    from pastix_tpu.numeric.factorize import _sym_lower

    ndev = mesh.shape[tp_axis]
    owner = proportional_mapping(layout, ndev)
    loc_levels, boundary, mask = _local_tables(layout, owner, ndev)
    T, npool, nb, nbc = layout.T, layout.npool, boundary.size, layout.nbc
    shared_levels, shared_tabs = _shared_split(layout, owner, ndev)
    shared_extra = [
        {
            "tc": np.asarray(lv.trsm_col, np.int32),
            "cols": np.asarray(lv.cols, np.int32),
        }
        for lv in shared_levels
    ]
    gk_sharded = []
    for lv in shared_levels:
        ng = lv.gemm_a.size
        per = -(-max(ng, 1) // ndev)
        pad = per * ndev - ng
        gk = np.concatenate(
            [np.asarray(lv.gemm_k), np.full(pad, nbc, np.int64)]
        ) if ng else np.full(per * ndev, nbc, np.int64)
        gk_sharded.append(np.asarray(gk.reshape(ndev, per), np.int32))

    # d merge mask: local columns belong to their owner; shared columns are
    # computed identically everywhere -> attribute them to device 0
    col_owner = owner.copy()
    dmask = np.zeros((ndev, nbc), np.float32)
    for d in range(ndev):
        dmask[d] = (col_owner == d) | ((col_owner == -1) & (d == 0))

    def fact_local(pool, eps):
        me = lax.axis_index(tp_axis)
        acc = jnp.zeros((nb + 1, T, T), pool.dtype)
        buf = jnp.concatenate([pool, acc], axis=0)
        d_arr = jnp.ones((nbc, T), pool.dtype)
        npiv = jnp.int32(0)

        # ---- local phase: zero collectives ----
        for t in loc_levels:
            diag_idx = jnp.asarray(t["diag"])[me]
            cols_me = jnp.asarray(t["cols"])[me]
            L, d, piv = K.ldlt_batch(
                _sym_lower(buf[diag_idx], hermitian), eps, hermitian
            )
            buf = buf.at[diag_idx].set(L)
            d_arr = d_arr.at[cols_me].set(d)
            npiv = npiv + jnp.where(cols_me < nbc, piv, 0).sum(
                dtype=jnp.int32
            )
            tp = jnp.asarray(t["tp"])[me]
            tc_me = jnp.asarray(t["tc"])[me]
            panels = K.trsm_ldlt(
                buf[tp], buf[jnp.asarray(t["td"])[me]],
                d_arr[jnp.minimum(tc_me, nbc - 1)], hermitian=hermitian,
            )
            buf = buf.at[tp].set(panels)
            ga = jnp.asarray(t["ga"])[me]
            gb = jnp.asarray(t["gb"])[me]
            gd = jnp.asarray(t["gd"])[me]
            gk = jnp.asarray(t["gk"])[me]
            a = buf[ga] * d_arr[jnp.minimum(gk, nbc - 1)][:, None, :]
            b = buf[gb]
            if hermitian and jnp.iscomplexobj(b):
                b = jnp.conj(b)
            contrib = jnp.einsum(
                "bij,bkj->bik", a, b,
                preferred_element_type=buf.dtype,
                precision=K.matmul_precision(),
            )
            buf = buf.at[gd].add(-contrib)

        # ---- single boundary fan-in ----
        pool = buf[:npool]
        if nb:
            bnd = lax.psum(buf[npool : npool + nb], tp_axis)
            pool = pool.at[jnp.asarray(boundary.astype(np.int32))].add(bnd)

        # ---- shared top phase (bulk-synchronous, like sharded LDLT) ----
        for t, ex, gks in zip(shared_tabs, shared_extra, gk_sharded):
            if t["tp"].size:
                L, d, dinv, piv = K.ldlt_inv_batch(
                    _sym_lower(pool[t["diag"]], hermitian), eps, hermitian
                )
            else:
                L, d, piv = K.ldlt_batch(
                    _sym_lower(pool[t["diag"]], hermitian), eps, hermitian
                )
            pool = pool.at[t["diag"]].set(L)
            d_arr = d_arr.at[ex["cols"]].set(d)
            # shared pivots are computed identically on every device:
            # count them on device 0 only (the d merge does the same)
            npiv = npiv + jnp.where(me == 0, piv.sum(dtype=jnp.int32), 0)
            if t["tp"].size:
                inv_p = dinv[t["tcpos"]]
                if hermitian and jnp.iscomplexobj(pool):
                    inv_p = jnp.conj(inv_p)
                panels = jnp.einsum(
                    "bij,bkj->bik", pool[t["tp"]], inv_p,
                    preferred_element_type=pool.dtype,
                    precision=K.matmul_precision(),
                ) / d_arr[ex["tc"]][:, None, :]
                pool = pool.at[t["tp"]].set(panels)
            if t["ntouch"]:
                ga = jnp.asarray(t["ga"])[me]
                gb = jnp.asarray(t["gb"])[me]
                gp = jnp.asarray(t["gp"])[me]
                gk = jnp.asarray(gks)[me]
                a = pool[ga] * d_arr[jnp.minimum(gk, nbc - 1)][:, None, :]
                b = pool[gb]
                if hermitian and jnp.iscomplexobj(b):
                    b = jnp.conj(b)
                contrib = jnp.einsum(
                    "bij,bkj->bik", a, b,
                    preferred_element_type=pool.dtype,
                    precision=K.matmul_precision(),
                )
                acc2 = jnp.zeros((t["ntouch"] + 1, T, T), pool.dtype)
                acc2 = acc2.at[gp].add(contrib)
                acc2 = lax.psum(acc2, tp_axis)
                pool = pool.at[t["touched"]].add(-acc2[: t["ntouch"]])

        # ---- reconcile pool, d and the pivot count ----
        m = jnp.asarray(mask)[me][:, None, None]
        pool = lax.psum(pool * m, tp_axis)
        dm = jnp.asarray(dmask)[me][:, None]
        d_arr = lax.psum(d_arr * dm, tp_axis)
        npiv = lax.psum(npiv, tp_axis)
        return pool, d_arr, npiv

    fn = jax.shard_map(
        fact_local, mesh=mesh, in_specs=(P(), P()),
        out_specs=(P(), P(), P()), check_vma=False,
    )
    return jax.jit(fn)
