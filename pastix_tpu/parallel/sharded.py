"""Sharded factorization and solve via shard_map + collectives.

Replaces the reference's MPI fan-in exchange (sopalin comm,
``src/sopalin/src/sopalin3d.c`` Isend/Irecv of FanInTarget buffers —
SURVEY.md §2 row 10): every level's trailing-update GEMM batch is
partitioned over the ``tp`` mesh axis, each device scatter-adds its partial
contributions into a compact per-level buffer of *touched* tiles, and one
``psum`` per level accumulates them — the all-reduce rides ICI and is the
exact algebraic equivalent of fan-in aggregation.

Per-level panel factorizations/TRSMs run replicated across ``tp`` (small
fraction of flops); the dense terminal block — the top separators on the
sequential critical path — is 2D-sharded row-slab-wise with per-step
psum/all_gather (see :func:`_tail_factor_sharded`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from pastix_tpu.analyze.layout import SolverLayout
from pastix_tpu.numeric import kernels as K


def _shard_tables(layout: SolverLayout, ndev: int, levels=None):
    """Per-level: device-partitioned gemm triples + touched-tile lists."""
    tabs = []
    for lv in layout.levels if levels is None else levels:
        ng = lv.gemm_a.size
        touched, pos = (
            np.unique(lv.gemm_d, return_inverse=True)
            if ng
            else (np.empty(0, np.int64), np.empty(0, np.int64))
        )
        per = -(-max(ng, 1) // ndev)
        pad = per * ndev - ng
        # padded triples write to a sacrificial slot (len(touched))
        ga = np.concatenate([lv.gemm_a, np.zeros(pad, np.int32)])
        gb = np.concatenate([lv.gemm_b, np.zeros(pad, np.int32)])
        gp = np.concatenate(
            [pos.astype(np.int32), np.full(pad, len(touched), np.int32)]
        )
        tabs.append(
            {
                "diag": np.asarray(lv.diag),
                "tp": np.asarray(lv.trsm_panel),
                "td": np.asarray(lv.trsm_diag),
                # panel's column position within the level's diag batch
                # (for the TRSM-as-matmul against the fused tile inverses)
                "tcpos": np.searchsorted(lv.cols, lv.trsm_col).astype(
                    np.int32
                ),
                "ga": np.asarray(ga.reshape(ndev, per)),
                "gb": np.asarray(gb.reshape(ndev, per)),
                "gp": np.asarray(gp.reshape(ndev, per)),
                "touched": np.asarray(touched.astype(np.int32)),
                "ntouch": int(len(touched)),
            }
        )
    return tabs


def _stack_shard_tables(run, npool: int):
    """Stack a run of per-level shard tables into uniform scan xs.

    Padding follows the grouping.py OOB convention: pool-index pads use
    ``npool`` (gathers clamp to junk that is then dropped, scatters drop),
    touched-slot pads route contributions to a sacrificial accumulator row
    whose target tile index is also ``npool``."""
    md = max(t["diag"].size for t in run)
    mt = max(max(t["tp"].size for t in run), 1)
    mn = max(max(t["ntouch"] for t in run), 1)
    ndev, _ = run[0]["ga"].shape
    mp = max(t["ga"].shape[1] for t in run)

    def pad1(a, m, fill):
        out = np.full(m, fill, dtype=np.int32)
        out[: a.size] = a
        return out

    def pad2(a, m, fill):
        out = np.full((ndev, m), fill, dtype=np.int32)
        out[:, : a.shape[1]] = a
        return out

    return {
        "diag": np.stack([pad1(t["diag"], md, npool) for t in run]),
        "tp": np.stack([pad1(t["tp"], mt, npool) for t in run]),
        "td": np.stack([pad1(t["td"], mt, npool) for t in run]),
        # pads clamp into the diag batch (their gathered inverse multiplies
        # a pool[npool] junk panel whose scatter is dropped)
        "tcpos": np.stack(
            [np.minimum(pad1(t["tcpos"], mt, 0), md - 1) for t in run]
        ),
        # padded triples read tile 0 (junk) and land in the sacrificial row
        "ga": np.stack([pad2(t["ga"], mp, 0) for t in run]),
        "gb": np.stack([pad2(t["gb"], mp, 0) for t in run]),
        "gp": np.stack([pad2(t["gp"], mp, mn) for t in run]),
        "touched": np.stack([pad1(t["touched"], mn, npool) for t in run]),
        "ntouch": mn,
    }


def _shard_plan(layout: SolverLayout, ndev: int, levels=None):
    """("unroll", tab) / ("scan", stacked tab) plan for the sharded path —
    same level partition as the single-device programs (grouping.py)."""
    from pastix_tpu.numeric.grouping import group_plan

    if levels is None:
        levels = layout.levels
    tabs = _shard_tables(layout, ndev, levels)
    plan = []
    for tag, item in group_plan(levels, T=layout.T):
        if tag == "unroll":
            plan.append(("unroll", tabs[item]))
        else:
            plan.append(
                ("scan", _stack_shard_tables([tabs[i] for i in item], layout.npool))
            )
    return plan


def _tail_factor_sharded(layout: SolverLayout, dense_tail, ndev: int,
                         tp_axis: str, update_dtype=None):
    """2D-sharded dense-tail Cholesky (call inside shard_map).

    The few huge terminal panels are the sequential critical path; the
    replicated tail capped multi-chip scaling (VERDICT r1 item 4; the
    reference switches its top separators to 2D block task distribution
    for the same reason — blend's splitpart/task granularity, SURVEY.md
    §2 row 7).  Here each device owns a row slab of the (m, m) tail:
    per tile-column step the owner's diagonal factor is psum-broadcast,
    every device TRSMs its slab rows, one all_gather shares the panel
    column, and the trailing update runs slab-local — per-device flops
    scale ~1/ndev and the collectives ride ICI.
    """
    T = layout.T
    tq = dense_tail.q
    L = -(-tq // ndev)  # row tiles per device
    tqp = L * ndev
    t_p = np.asarray(dense_tail.p_idx)
    t_qi = np.asarray(dense_tail.qi)
    t_qj = np.asarray(dense_tail.qj)

    def tail_factor(pool):
        me = lax.axis_index(tp_axis)
        dense = jnp.zeros((tqp, T, tq, T), pool.dtype)
        dense = dense.at[t_qi, :, t_qj, :].set(pool[t_p])
        slab = lax.dynamic_slice_in_dim(dense, me * L, L, axis=0)
        gr = me * L + jnp.arange(L)  # global row-tile ids of the slab

        def step(j, slab):
            j = j.astype(jnp.int32)
            own = (j >= me * L) & (j < (me + 1) * L)
            jl = jnp.clip(j - me * L, 0, L - 1).astype(jnp.int32)
            zero = jnp.int32(0)
            d_own = lax.dynamic_slice(slab, (jl, zero, j, zero),
                                      (1, T, 1, T))
            diag = lax.psum(
                jnp.where(own, d_own, jnp.zeros_like(d_own)), tp_axis
            )[0, :, 0, :]
            Lj = lax.linalg.cholesky(jnp.tril(diag), symmetrize_input=False)
            Li = lax.linalg.triangular_solve(
                Lj, jnp.eye(T, dtype=pool.dtype), left_side=True, lower=True
            )
            upd = jnp.where(own, Lj[None, :, None, :], d_own)
            slab = lax.dynamic_update_slice(slab, upd, (jl, zero, j, zero))
            col = lax.dynamic_slice(slab, (zero, zero, j, zero),
                                    (L, T, 1, T))[:, :, 0, :]
            inv = jnp.conj(Li) if jnp.iscomplexobj(Li) else Li
            P = jnp.einsum(
                "rit,kt->rik", col, inv,
                preferred_element_type=pool.dtype,
                precision=K.matmul_precision(),
            )
            P = jnp.where((gr > j)[:, None, None], P, 0.0)
            keep = jnp.where((gr > j)[:, None, None], P, col)
            slab = lax.dynamic_update_slice(
                slab, keep[:, :, None, :], (zero, zero, j, zero)
            )
            Pfull = lax.all_gather(P, tp_axis, axis=0, tiled=True)[:tq]
            if jnp.iscomplexobj(Pfull):
                Pfull = jnp.conj(Pfull)
            Pa = P.astype(update_dtype) if update_dtype else P
            Pb = Pfull.astype(update_dtype) if update_dtype else Pfull
            contrib = jnp.einsum(
                "rik,cjk->ricj", Pa, Pb,
                preferred_element_type=pool.dtype,
                precision=K.matmul_precision(),
            ).astype(pool.dtype)
            return slab - contrib

        slab = lax.fori_loop(0, tq, step, slab)
        full = lax.all_gather(slab, tp_axis, axis=0, tiled=True)[:tq]
        return pool.at[t_p].set(full[t_qi, :, t_qj, :])

    return tail_factor


def build_sharded_factorize_llt(
    layout: SolverLayout, mesh: Mesh, tp_axis: str = "tp", dense_tail=None,
    update_dtype=None,
):
    """Jitted multi-device LL^T factorization (pool replicated, GEMM work
    sharded over ``tp_axis``, per-level psum fan-in).  Heavy levels are
    unrolled; runs of small levels scan over stacked padded tables.

    ``dense_tail``: dense terminal block plan — the tail's level chain is
    replaced by one dense Cholesky, computed replicated on every device
    (it sits on the sequential critical path; a 2D-sharded dense panel
    factor is the M6 follow-up)."""
    ndev = mesh.shape[tp_axis]
    plan = _shard_plan(
        layout, ndev,
        dense_tail.levels_lo if dense_tail is not None else None,
    )
    T = layout.T

    if dense_tail is not None:
        tail_factor = _tail_factor_sharded(
            layout, dense_tail, ndev, tp_axis, update_dtype=update_dtype
        )

    def level(pool, t, me, ntouch):
        # XLA's blocked cholesky/triangular-solve expanders measured faster
        # than the fused chol+inverse loop on v5e (BASELINE.md §4b A/B):
        # panel TRSM as a matmul against the level's inverted diagonals
        diag = K.potrf_batch(jnp.tril(pool[t["diag"]]))
        pool = pool.at[t["diag"]].set(diag)
        if t["tp"].size:
            eye = jnp.broadcast_to(
                jnp.eye(T, dtype=pool.dtype), diag.shape
            )
            dinv = lax.linalg.triangular_solve(
                diag, eye, left_side=True, lower=True
            )
            panels = jnp.einsum(
                "bij,bkj->bik", pool[t["tp"]], dinv[t["tcpos"]],
                preferred_element_type=pool.dtype,
                precision=K.matmul_precision(),
            )
            pool = pool.at[t["tp"]].set(panels)
        if ntouch:
            # tables stay numpy (host constants — device-array closures
            # wedge the remote-TPU platform); dynamic device index needs
            # the traced view
            ga = jnp.asarray(t["ga"])[me]
            gb = jnp.asarray(t["gb"])[me]
            gp = jnp.asarray(t["gp"])[me]
            a, b = pool[ga], pool[gb]
            if update_dtype is not None:
                a, b = a.astype(update_dtype), b.astype(update_dtype)
            contrib = jnp.einsum(
                "bij,bkj->bik", a, b,
                preferred_element_type=pool.dtype,
                precision=K.matmul_precision(),
            ).astype(pool.dtype)
            acc = jnp.zeros((ntouch + 1, T, T), pool.dtype)
            acc = acc.at[gp].add(contrib)
            acc = lax.psum(acc, tp_axis)  # fan-in aggregation over ICI
            pool = pool.at[t["touched"]].add(-acc[:ntouch])
        return pool

    def fact_local(pool):
        me = lax.axis_index(tp_axis)
        for tag, t in plan:
            if tag == "unroll":
                pool = level(pool, t, me, t["ntouch"])
            else:
                nt = t["ntouch"]

                def body(pool, x):
                    return level(pool, x, me, nt), None

                pool, _ = lax.scan(body, pool, {k: v for k, v in t.items() if k != "ntouch"})
        if dense_tail is not None:
            pool = tail_factor(pool)
        return pool

    fn = jax.shard_map(
        fact_local,
        mesh=mesh,
        in_specs=P(),
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(fn)


def build_sharded_factorize_ldlt(
    layout: SolverLayout, mesh: Mesh, tp_axis: str = "tp",
    hermitian: bool = False, update_dtype=None,
):
    """Jitted multi-device LDL^T: same fan-in scheme as the LL^T path with
    the unit-L/diagonal-D kernels; returns fn(pool, eps) -> (pool, d, npiv)."""
    ndev = mesh.shape[tp_axis]
    tabs = _shard_tables(layout, ndev)
    # per-level trsm column ids + gemm source-column ids for the D scaling
    extra = [
        {"tc": np.asarray(lv.trsm_col), "cols": np.asarray(lv.cols)}
        for lv in layout.levels
    ]
    gk_sharded = []
    for lv in layout.levels:
        ng = lv.gemm_a.size
        per = -(-max(ng, 1) // ndev)
        pad = per * ndev - ng
        gk = np.concatenate([lv.gemm_k, np.zeros(pad, np.int32)])
        gk_sharded.append(np.asarray(gk.reshape(ndev, per)))
    T, nbc = layout.T, layout.nbc
    from pastix_tpu.numeric.factorize import _sym_lower

    def fact_local(pool, eps):
        me = lax.axis_index(tp_axis)
        d_arr = jnp.ones((nbc, T), pool.dtype)
        npiv = jnp.int32(0)
        for t, ex, gks in zip(tabs, extra, gk_sharded):
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
            npiv = npiv + piv.sum(dtype=jnp.int32)
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
                a = pool[ga] * d_arr[gk][:, None, :]
                b = pool[gb]
                if hermitian and jnp.iscomplexobj(b):
                    b = jnp.conj(b)
                if update_dtype is not None:
                    a, b = a.astype(update_dtype), b.astype(update_dtype)
                contrib = jnp.einsum(
                    "bij,bkj->bik", a, b,
                    preferred_element_type=pool.dtype,
                    precision=K.matmul_precision(),
                ).astype(pool.dtype)
                acc = jnp.zeros((t["ntouch"] + 1, T, T), pool.dtype)
                acc = acc.at[gp].add(contrib)
                acc = lax.psum(acc, tp_axis)
                pool = pool.at[t["touched"]].add(-acc[: t["ntouch"]])
        return pool, d_arr, npiv

    fn = jax.shard_map(
        fact_local,
        mesh=mesh,
        in_specs=(P(), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(fn)


def _shard_tables_with_nd(layout: SolverLayout, ndev: int):
    """Shard tables plus the off-diagonal-target partition (LU U-side)."""
    tabs = _shard_tables(layout, ndev)
    out = []
    for lv, t in zip(layout.levels, tabs):
        ng = lv.gemm_a.size
        nd_mask = lv.gemm_nondiag
        tn, posn = (
            np.unique(lv.gemm_d[nd_mask], return_inverse=True)
            if nd_mask.any()
            else (np.empty(0, np.int64), np.empty(0, np.int64))
        )
        # same (ndev, per) partition as the main triples; diagonal-target
        # slots route to the sacrificial accumulator row
        per = t["ga"].shape[1]
        pad = per * ndev - ng
        gpn = np.full(ng, len(tn), np.int64)
        if nd_mask.any():
            gpn[nd_mask] = posn
        gpn = np.concatenate([gpn, np.full(pad, len(tn), np.int64)])
        t = dict(t)
        t["gp_u"] = np.asarray(gpn.reshape(ndev, per).astype(np.int32))
        t["touched_u"] = np.asarray(tn.astype(np.int32))
        t["ntouch_u"] = int(len(tn))
        out.append(t)
    return out


def build_sharded_factorize_lu(
    layout: SolverLayout, mesh: Mesh, tp_axis: str = "tp", update_dtype=None,
):
    """Jitted multi-device LU with static pivoting: the L- and U-side
    trailing updates use the same partitioned triples with separate
    fan-in accumulators (U-side drops diagonal targets).
    Returns fn(pool, pool_u, eps) -> (pool, pool_u, npiv)."""
    ndev = mesh.shape[tp_axis]
    tabs = _shard_tables_with_nd(layout, ndev)
    T = layout.T

    def fact_local(pool, pool_u, eps):
        me = lax.axis_index(tp_axis)
        npiv = jnp.int32(0)
        for t in tabs:
            if t["tp"].size:
                diag, linv, uinv_t, piv = K.getrf_inv_batch(
                    pool[t["diag"]], eps
                )
            else:
                diag, piv = K.getrf_batch(pool[t["diag"]], eps)
            pool = pool.at[t["diag"]].set(diag)
            npiv = npiv + piv.sum(dtype=jnp.int32)
            if t["tp"].size:
                lp = jnp.einsum(
                    "bij,bkj->bik", pool[t["tp"]], uinv_t[t["tcpos"]],
                    preferred_element_type=pool.dtype,
                    precision=K.matmul_precision(),
                )
                up = jnp.einsum(
                    "bij,bkj->bik", pool_u[t["tp"]], linv[t["tcpos"]],
                    preferred_element_type=pool.dtype,
                    precision=K.matmul_precision(),
                )
                pool = pool.at[t["tp"]].set(lp)
                pool_u = pool_u.at[t["tp"]].set(up)
            if t["ntouch"]:
                ga = jnp.asarray(t["ga"])[me]
                gb = jnp.asarray(t["gb"])[me]
                gp = jnp.asarray(t["gp"])[me]
                # L-side: A(I,K) -= L(I,J) @ U(J,K) = Lp[ga] @ Ut[gb]^T
                al, bu = pool[ga], pool_u[gb]
                if update_dtype is not None:
                    al, bu = al.astype(update_dtype), bu.astype(update_dtype)
                c = jnp.einsum(
                    "bij,bkj->bik", al, bu,
                    preferred_element_type=pool.dtype,
                    precision=K.matmul_precision(),
                ).astype(pool.dtype)
                acc = jnp.zeros((t["ntouch"] + 1, T, T), pool.dtype)
                acc = acc.at[gp].add(c)
                acc = lax.psum(acc, tp_axis)
                pool = pool.at[t["touched"]].add(-acc[: t["ntouch"]])
                if t["ntouch_u"]:
                    gpu = jnp.asarray(t["gp_u"])[me]
                    au, bl = pool_u[ga], pool[gb]
                    if update_dtype is not None:
                        au = au.astype(update_dtype)
                        bl = bl.astype(update_dtype)
                    cu = jnp.einsum(
                        "bij,bkj->bik", au, bl,
                        preferred_element_type=pool.dtype,
                        precision=K.matmul_precision(),
                    ).astype(pool.dtype)
                    accu = jnp.zeros((t["ntouch_u"] + 1, T, T), pool.dtype)
                    accu = accu.at[gpu].add(cu)
                    accu = lax.psum(accu, tp_axis)
                    pool_u = pool_u.at[t["touched_u"]].add(
                        -accu[: t["ntouch_u"]]
                    )
        return pool, pool_u, npiv

    fn = jax.shard_map(
        fact_local,
        mesh=mesh,
        in_specs=(P(), P(), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(fn)


def build_sharded_solve(layout: SolverLayout, mesh: Mesh, kind=None,
                        dp_axis: str = "dp", dense_tail=None,
                        hermitian=None):
    """Jitted multi-device solve: RHS batch sharded over ``dp_axis``
    (independent systems — the data-parallel axis), factor replicated.

    Signatures follow build_solve_fn: LLT fn(pool, b); LDLT fn(pool, d, b);
    LU fn(pool, pool_u, b).  ``dp_axis=None`` runs the sweep replicated
    (every device solves the full RHS — correct on any mesh, no dp gain).
    The RHS column count is padded to a dp multiple per call."""
    from pastix_tpu.solve import build_solve_fn
    from pastix_tpu.config import Factorization

    if kind is None:
        kind = Factorization.LLT
    inner = build_solve_fn(
        layout, kind, hermitian=hermitian, dense_tail=dense_tail
    )
    nfact = 1 if kind == Factorization.LLT else 2
    bspec = P(None, None, dp_axis) if dp_axis else P()
    fn = jax.shard_map(
        lambda *args: inner(*args),
        mesh=mesh,
        in_specs=(P(),) * nfact + (bspec,),
        out_specs=bspec,
        check_vma=False,
    )
    jfn = jax.jit(fn)
    if not dp_axis:
        return jfn
    ndp = mesh.shape[dp_axis]

    def wrap(*args):
        b = args[-1]
        R = b.shape[-1]
        pad = (-R) % ndp
        if pad:
            b = jnp.concatenate(
                [b, jnp.zeros(b.shape[:-1] + (pad,), b.dtype)], axis=-1
            )
        out = jfn(*args[:-1], b)
        return out[..., :R] if pad else out

    return wrap


def shard_coo(A_coo, mesh: Mesh, tp_axis: str = "tp", dtype=np.float32):
    """Pad a scipy COO matrix's arrays to a tp multiple for P(tp) sharding.

    Pad entries carry value 0 at (row 0, col 0) — a scatter-add of zero."""
    ndev = mesh.shape[tp_axis]
    nnz = A_coo.nnz
    pad = (-nnz) % ndev
    arow = np.concatenate([A_coo.row.astype(np.int32), np.zeros(pad, np.int32)])
    acol = np.concatenate([A_coo.col.astype(np.int32), np.zeros(pad, np.int32)])
    avals = np.concatenate([A_coo.data.astype(dtype), np.zeros(pad, dtype)])
    return arow, acol, avals


def build_sharded_refine(layout: SolverLayout, mesh: Mesh, kind=None,
                         tp_axis: str = "tp", hermitian=None,
                         dense_tail=None):
    """Fused multi-device solve + Richardson refinement in one program.

    The residual SpMV is sharded over ``tp_axis`` (COO partitioned with
    :func:`shard_coo`; partial products summed with one psum — the
    distributed CscbMAx of the reference's raff loop, SURVEY.md §3.5);
    the factored sweeps run replicated.

    Returns fn(factor_args, arow, acol, avals, b, eps, itermax) ->
    (x, iters, rel_res) with factor_args = (pool,) / (pool, d) /
    (pool, pool_u) and b of shape (nbc, T, R)."""
    from pastix_tpu.solve import build_solve_fn
    from pastix_tpu.config import Factorization

    if kind is None:
        kind = Factorization.LLT
    inner = build_solve_fn(
        layout, kind, hermitian=hermitian, dense_tail=dense_tail
    )
    nfact = 1 if kind == Factorization.LLT else 2
    nbc, T = layout.nbc, layout.T
    _TINY = 1e-30

    def refine_local(*args):
        fa, (arow, acol, avals, b, eps, itermax) = args[:nfact], args[nfact:]
        R = b.shape[-1]
        bf = b.reshape(nbc * T, R)

        def spmv(x):
            yf = jnp.zeros_like(bf)
            yf = yf.at[arow].add(avals[:, None] * x.reshape(nbc * T, R)[acol])
            return lax.psum(yf, tp_axis).reshape(nbc, T, R)

        def res2(rr):
            return jnp.sum(rr.reshape(nbc * T, R) ** 2)

        bnorm2 = jnp.maximum(jnp.sum(bf * bf), _TINY)
        x = inner(*fa, b)
        r = b - spmv(x)

        def cond(c):
            _, rr, prev2, it = c
            r2 = res2(rr)
            improving = r2 < 0.25 * prev2  # stop grinding at the fp32 floor
            return (r2 > eps * eps * bnorm2) & improving & (it < itermax)

        def body(c):
            x, rr, _, it = c
            x = x + inner(*fa, rr)
            return x, b - spmv(x), res2(rr), it + 1

        x, r, _, it = lax.while_loop(
            cond, body,
            (x, r, jnp.full((), np.inf, dtype=bnorm2.dtype), jnp.int32(0)),
        )
        return x, it, jnp.sqrt(res2(r) / bnorm2)

    fn = jax.shard_map(
        refine_local,
        mesh=mesh,
        in_specs=(P(),) * nfact + (P(tp_axis), P(tp_axis), P(tp_axis), P(), P(), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    jfn = jax.jit(fn)

    def wrap(fa, arow, acol, avals, b, eps, itermax):
        return jfn(*fa, arow, acol, avals, b, eps, itermax)

    return wrap
