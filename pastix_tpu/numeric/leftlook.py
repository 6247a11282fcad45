"""Left-looking E2 schedule + Pallas kernel (the round-5 byte-wall fix).

Round-4 measured the E2 wall as BYTES x DMA-DEPTH (exp_dma.py).  The
byte model (exp_bytes.py) then located the bytes: under the right-looking
per-source-level schedule the flagship performs 1.65M dst-tile
read-modify-writes (217 GB — each trailing tile is re-read+re-written
once per source level, ~10x over the factorization, mean segment only
1.27 pairs).  Regrouping every update at its TARGET column's level
(classic left-looking supernodal schedule — the reference's compute
shape in ``src/sopalin/src/sopalin3d.c`` is right-looking fan-in, but
its COEFTAB accumulation per cblk is the same "each tile written once"
contract) collapses dst traffic to one RMW per stored tile (~15 GB) and
lengthens segments to ~18.5 pairs:

  * dst tiles: VMEM accumulator per segment, read+written ONCE total;
  * b operands L(K,J): reused ~segment-length times -> per-chunk unique
    tiles gathered once (XLA gather, cast to the update dtype) and DMA'd
    into a VMEM cache in ONE transfer (the exp_cache r4 prototype,
    hardware-validated bit-identical);
  * a operands L(I,J): reuse under target grouping is ~1.3x, so the a
    side keeps the proven deep-slotted per-pair DMA pipeline from the
    pool (fp32, depth = slots x group >= 8) — unless the level's a-reuse
    is high (the dense-tail pre-pass: ~4x), where a joins the cache;
  * G pairs of ONE segment per grid step: segments are padded to a
    multiple of G with null pairs that read a ZEROED cache slot
    (contribution exactly 0.0 — no per-pair predication), the G dots
    accumulate in registers, and the segment bookkeeping (flag decode,
    accumulator RMW) runs once per step instead of once per pair.

Schedules are host-built; chunks are adaptively sized so the unique
cached tiles stay under the scoped-VMEM cap.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pastix_tpu.numeric.pallas_kernels import (
    _F_FIRST, _F_LAST, _F_WRWAIT, _F_PAR,
)

_INTERPRET = False  # set True (tests) to run the kernel off-TPU


def build_ll_schedule(
    ga,
    gb,
    gd,
    gk=None,
    group: int = 4,
    cap: int = 256,
    chunk_max: int = 16384,
    mode: str = "auto",
    full_reuse_min: float = 3.0,
    rb=None,
    T: int = 128,
):
    """Dst-sorted, segment-padded-to-G chunked schedule for the LL kernel.

    Returns a list of per-chunk dicts.  ``mode``:
      "bcache": only b tiles cached (a via per-pair DMA from the pool)
      "full"  : both operands cached (a-reuse must make the cap worthwhile)
      "auto"  : "full" iff the list's a-side reuse >= ``full_reuse_min``
    ``cap``: max unique cached tiles per chunk (scoped-VMEM budget).

    ``rb``: optional (row_lo, row_hi) per-pool-tile scalar row supports
    (layout.row_lo/row_hi — the splitpart IPARM_MIN_BLOCKSIZE analog,
    reference ``src/blend/src/splitpart.c``).  A pair's contribution has
    nonzero rows only inside its *a* tile's support, so pairs are
    classed by quantized support height H in {T/4, T/2, 3T/4, T}
    (start rounded down to the 8-sublane grid) and chunks are built
    class-uniform: each chunk's dots run at static (H, T) x (T, T)
    shape — device flops drop by the padding the full-tile schedule
    would execute.  ``rb=None`` keeps full-height tiles.
    """
    ga = np.asarray(ga, np.int64)
    gb = np.asarray(gb, np.int64)
    gd = np.asarray(gd, np.int64)
    ng = gd.size
    if ng == 0:
        return []
    if gk is not None:
        gk = np.asarray(gk, np.int64)
    if mode == "auto":
        r_a = ng / max(1, np.unique(ga).size)
        mode = "full" if r_a >= full_reuse_min else "bcache"
    if rb is not None:
        row_lo, row_hi = rb
        rl = np.asarray(row_lo, np.int64)[ga]
        rh = np.asarray(row_hi, np.int64)[ga]
        rl = (rl // 8) * 8
        q = T // 4
        # row_hi is INCLUSIVE (layout.py): support height is rh+1-rl
        H = np.clip(-(-(rh + 1 - rl) // q), 1, 4) * q
        rl = np.minimum(rl, T - H)
        out = []
        for h in (q, 2 * q, 3 * q, 4 * q):
            m = H == h
            if not m.any():
                continue
            out.extend(_ll_chunks(
                ga[m], gb[m], gd[m],
                gk[m] if gk is not None else None,
                rl[m], int(h), group, cap, chunk_max, mode, T,
            ))
        return out
    return _ll_chunks(
        ga, gb, gd, gk, np.zeros(ng, np.int64), T, group, cap,
        chunk_max, mode, T,
    )


def _ll_chunks(ga, gb, gd, gk, rl, H, group, cap, chunk_max, mode, T):
    """Core chunker for one row-height class (H == T: full tiles)."""
    ng = gd.size
    order = np.argsort(gd, kind="stable")
    ga, gb, gd, rl = ga[order], gb[order], gd[order], rl[order]
    if gk is not None:
        gk = gk[order]

    # --- segment-pad to a multiple of group -----------------------------
    G = int(group)
    first = np.empty(ng, np.int64)
    first[0] = 1
    first[1:] = gd[1:] != gd[:-1]
    seg = np.cumsum(first) - 1
    slen = np.bincount(seg)
    plen = (-(-slen // G)) * G
    npad_tot = int(plen.sum())
    # scatter real pairs into the padded arrays (null = -1)
    starts = np.concatenate([[0], np.cumsum(plen)[:-1]])
    pos_in_seg = np.arange(ng) - np.concatenate([[0], np.cumsum(slen)[:-1]])[seg]
    src_pos = starts[seg] + pos_in_seg
    pga = np.full(npad_tot, -1, np.int64)
    pgb = np.full(npad_tot, -1, np.int64)
    pga[src_pos] = ga
    pgb[src_pos] = gb
    prl = np.zeros(npad_tot, np.int64)
    prl[src_pos] = rl
    if gk is not None:
        pgk = np.zeros(npad_tot, np.int64)
        pgk[src_pos] = gk
    seg_dst_all = gd[np.flatnonzero(first)]
    step_dst = np.repeat(seg_dst_all, plen // G)
    step_seg = np.repeat(np.arange(slen.size), plen // G)
    nsteps_total = npad_tot // G

    # --- adaptive chunking: unique cached tiles <= cap ------------------
    out = []
    lo = 0
    ch_steps_max = max(1, chunk_max // G)
    while lo < nsteps_total:
        hi = min(lo + ch_steps_max, nsteps_total)
        while True:
            cgb = pgb[lo * G: hi * G]
            cga = pga[lo * G: hi * G]
            if mode == "full":
                cand = np.concatenate([cga[cga >= 0], cgb[cgb >= 0]])
            else:
                cand = cgb[cgb >= 0]
            u = np.unique(cand)
            if u.size + 1 <= cap or hi - lo <= 1:
                break
            # shrink proportionally (cheap, converges in a few rounds)
            hi = lo + max(1, int((hi - lo) * (cap - 1) / u.size))
        ns = hi - lo
        ZS = u.size  # zero slot: cache rows >= u.size stay zero
        gb_v = np.full(ns * G, ZS, np.int32)
        m = cgb >= 0
        gb_v[m] = np.searchsorted(u, cgb[m])
        if mode == "full":
            ga_v = np.full(ns * G, ZS, np.int32)
            ga_v[m] = np.searchsorted(u, cga[m])
        else:
            # per-pair DMA needs a safe pool index for null pairs: reuse
            # the chunk's first real a tile (its dot against the zero
            # slot contributes exactly 0)
            safe = cga[m][0] if m.any() else 0
            ga_p = np.where(cga >= 0, cga, safe).astype(np.int32)
        # per-step segment flags (same machinery as the pair kernel,
        # one decode per G pairs)
        cseg = step_seg[lo:hi]
        cdst = step_dst[lo:hi]
        sf = np.empty(ns, np.int32)
        sf[0] = 1
        sf[1:] = cseg[1:] != cseg[:-1]
        sl = np.empty(ns, np.int32)
        sl[-1] = 1
        sl[:-1] = cseg[1:] != cseg[:-1]
        lseg = np.cumsum(sf) - 1
        nseg = int(lseg[-1]) + 1
        par = (lseg & 1).astype(np.int32)
        firsts = np.flatnonzero(sf)
        seg_dst = cdst[firsts]
        rd = np.full(ns, -1, np.int32)
        rd[firsts[:-1]] = seg_dst[1:]
        wr_wait = np.zeros(ns, np.int32)
        wr_wait[firsts[1:-1]] = 1
        flags = (sf * _F_FIRST + sl * _F_LAST + wr_wait * _F_WRWAIT
                 + par * _F_PAR).astype(np.int32)
        endw = np.zeros(2, np.int32)
        endt = np.zeros(2, np.int32)
        p_last = (nseg - 1) & 1
        endw[p_last] = 1
        endt[p_last] = seg_dst[-1]
        if nseg >= 2:
            endw[1 - p_last] = 1
            endt[1 - p_last] = seg_dst[-2]
        t = {
            "mode": mode, "group": G, "nsteps": ns,
            "gb_v": gb_v, "gd": cdst.astype(np.int32),
            "flags": flags, "rd": rd, "endw": endw, "endt": endt,
            "cu": u.astype(np.int64),
            # quantized cache height: dedupes kernel compiles across chunks
            "CT": int(-(-(u.size + 1) // 64) * 64),
            "n_real": int(m.sum()),
            "H": int(H), "T": int(T),
            "rl": prl[lo * G: hi * G].astype(np.int32),
        }
        if mode == "full":
            t["ga_v"] = ga_v
        else:
            t["ga"] = ga_p
        if gk is not None:
            t["gk"] = np.where(
                pga[lo * G: hi * G] >= 0, pgk[lo * G: hi * G], 0
            ).astype(np.int32)
        out.append(t)
        lo = hi
    return out


def _mk_ll_kernel(nsteps, G, CT, scaled, a_dma, update_dtype, out_dtype,
                  slots, H=None, T=None):
    """One grid step = G pairs of ONE dst segment (null pads hit the
    zeroed cache slot).  Flags/rd/gd are per-step tables.

    ``H < T``: row-bounded class — a operands are (H, T) slices starting
    at the per-pair ``rl`` row, dots run at (H, T) x (T, T), and each
    pair accumulates into its own acc row window (no cross-pair register
    accumulation; the rows differ)."""
    cdt = update_dtype
    S = slots
    rowb = H is not None and T is not None and H < T

    def kernel(*args):
        if scaled:
            ga, gb, gd, flags, rd, endw, endt, gk, rlv = args[:9]
            refs = args[9:]
        else:
            ga, gb, gd, flags, rd, endw, endt, rlv = args[:8]
            refs = args[8:]
        refs = refs[1:]  # drop the input pool ref (aliased to out)
        Xc = refs[0]
        refs = refs[1:]
        if scaled:
            d_ref = refs[0]
            refs = refs[1:]
        if a_dma:
            out, cache, a_buf, acc, csem, asem, rsem, wsem = refs
        else:
            out, cache, acc, csem, rsem, wsem = refs
        i = pl.program_id(0)

        if a_dma:
            def a_cp(step, u, sl):
                j = step * G + u
                src = (
                    out.at[ga[j], pl.ds(rlv[j], H)] if rowb
                    else out.at[ga[j]]
                )
                return pltpu.make_async_copy(
                    src, a_buf.at[sl, u], asem.at[sl, u]
                )

        @pl.when(i == 0)
        def _():
            # the chunk's unique operand tiles: ONE DMA into VMEM
            cp = pltpu.make_async_copy(Xc, cache, csem)
            cp.start()
            if a_dma:
                for s0 in range(S - 1):
                    @pl.when(s0 < nsteps)
                    def _(s0=s0):
                        for u in range(G):
                            a_cp(s0, u, s0 % S).start()
            pltpu.make_async_copy(
                out.at[gd[0]], acc.at[0], rsem.at[0]
            ).start()
            cp.wait()

        if a_dma:
            @pl.when(i + S - 1 < nsteps)
            def _():
                sl = (i + S - 1) % S
                for u in range(G):
                    a_cp(i + S - 1, u, sl).start()

        f = flags[i]
        par = (f // _F_PAR) % 2

        @pl.when(f % 2 == 1)  # first step of a dst segment
        def _():
            pltpu.make_async_copy(
                out.at[gd[i]], acc.at[par], rsem.at[par]
            ).wait()

            @pl.when(rd[i] >= 0)
            def _():
                q = 1 - par

                @pl.when((f // _F_WRWAIT) % 2 == 1)
                def _():
                    pltpu.make_async_copy(
                        acc.at[q], out.at[gd[i - 1]], wsem.at[q]
                    ).wait()

                pltpu.make_async_copy(
                    out.at[rd[i]], acc.at[q], rsem.at[q]
                ).start()

        # G MXU dots; null pads read the zero slot.  Full-height chunks
        # accumulate the G contributions in registers (one acc RMW per
        # step); row-bounded chunks RMW each pair's own row window.
        dn = (((1,), (1,)), ((), ()))
        sl = i % S if a_dma else 0
        contrib = None
        for u in range(G):
            j = i * G + u
            if a_dma:
                a_cp(i, u, sl).wait()
                a = a_buf[sl, u]
            elif rowb:
                a = cache[ga[j], pl.ds(rlv[j], H)]
            else:
                a = cache[ga[j]]
            if scaled:
                a = a * d_ref[gk[j]][None, :]
            b = cache[gb[j]]
            c = jax.lax.dot_general(
                a.astype(cdt), b.astype(cdt), dn,
                preferred_element_type=jnp.float32,
            )
            if rowb:
                w = pl.ds(rlv[j], H)
                acc[par, w] = acc[par, w] - c.astype(out_dtype)
            else:
                contrib = c if contrib is None else contrib + c
        if not rowb:
            acc[par] = acc[par] - contrib.astype(out_dtype)

        @pl.when((f // _F_LAST) % 2 == 1)  # last step of a segment
        def _():
            pltpu.make_async_copy(
                acc.at[par], out.at[gd[i]], wsem.at[par]
            ).start()

        @pl.when(i == nsteps - 1)
        def _():
            for p in range(2):
                @pl.when(endw[p] == 1)
                def _(p=p):
                    pltpu.make_async_copy(
                        acc.at[p], out.at[endt[p]], wsem.at[p]
                    ).wait()

    return kernel


def gemm_scatter_ll(
    pool,
    schedule,
    d=None,
    src_pool=None,
    update_dtype=jnp.bfloat16,
    interpret=None,
    slots=None,
):
    """pool[gd] -= op(a) @ b^T, left-looking chunked LL kernel.

    ``schedule`` from :func:`build_ll_schedule`.  a tiles come from
    ``pool``; b tiles from ``src_pool`` if given (LU cross-pool) else
    ``pool`` — gathered per chunk into a compact cache cast to
    ``update_dtype``.  With ``d``, a-columns are scaled by d[gk] (LDLT).
    The pool is donated through each chunk (input_output_aliases)."""
    if interpret is None:
        interpret = _INTERPRET
    if slots is None:
        import os as _os

        slots = int(_os.environ.get("PASTIX_E2_SLOTS", "4"))
    T = pool.shape[1]
    scaled = d is not None
    out_dtype = pool.dtype
    cross = src_pool is not None
    for t in schedule:
        ns = t["nsteps"]
        if ns == 0:
            continue
        G, CT = t["group"], t["CT"]
        # clamp: schedules built without an explicit T default to T=128
        H = min(int(t.get("H", T)), T)
        a_dma = t["mode"] == "bcache"
        cu = jnp.asarray(t["cu"])
        # gather the cache from the LOOP-CARRIED pool: operand tiles are
        # earlier-level panels this level's chunks never touch, so the
        # values are identical — but the data dependency stops XLA from
        # hoisting every chunk's gather above the aliased pallas chain
        # (hoisted, the per-level transients sum to GBs and OOM HBM)
        if cross:
            src = jax.lax.optimization_barrier((src_pool, pool))[0]
        else:
            src = pool
        Xc = jnp.zeros((CT, T, T), update_dtype).at[: t["cu"].size].set(
            src[cu].astype(update_dtype)
        )
        kernel = _mk_ll_kernel(
            ns, G, CT, scaled, a_dma, update_dtype, out_dtype, slots,
            H=H, T=T,
        )
        scalars = [
            jnp.asarray(t["ga"] if a_dma else t["ga_v"]),
            jnp.asarray(t["gb_v"]),
            jnp.asarray(t["gd"]), jnp.asarray(t["flags"]),
            jnp.asarray(t["rd"]), jnp.asarray(t["endw"]),
            jnp.asarray(t["endt"]),
        ]
        if scaled:
            scalars.append(jnp.asarray(t["gk"]))
        scalars.append(jnp.asarray(
            t.get("rl", np.zeros(ns * G, np.int32)).astype(np.int32)
        ))
        nsc = len(scalars)
        scratch = [
            pltpu.VMEM((CT, T, T), update_dtype),  # operand cache
        ]
        if a_dma:
            scratch.append(pltpu.VMEM((slots, G, H, T), out_dtype))
        scratch += [
            pltpu.VMEM((2, T, T), out_dtype),  # dst accumulators
            pltpu.SemaphoreType.DMA(()),
        ]
        if a_dma:
            scratch.append(pltpu.SemaphoreType.DMA((slots, G)))
        scratch += [
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ]
        in_specs = [
            pl.BlockSpec(memory_space=pl.ANY),  # pool (aliased)
            pl.BlockSpec(memory_space=pl.ANY),  # cache source
        ]
        operands = [pool, Xc]
        if scaled:
            in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
            operands.append(d)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=nsc,
            grid=(ns,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=scratch,
        )
        pool = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(pool.shape, out_dtype),
            input_output_aliases={nsc: 0},
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            cost_estimate=pl.CostEstimate(
                flops=2 * ns * G * H * T * T,
                bytes_accessed=ns * G * T * T * 4,
                transcendentals=0,
            ),
            interpret=interpret,
        )(*scalars, *operands)
    return pool


def regroup_left(levels, blk_col, tail_s=None, unrolled=None):
    """Classify every update pair by its TARGET and emit the LL plan.

    Returns (reduced_levels, incoming, tail) where

      * reduced_levels[i] — LevelTables with the outgoing gemm tables cut
        to the RESIDUE (targets in scanned levels / Schur columns, which
        stay right-looking at their source);
      * incoming[i] — (ga, gb, gd, gk, nd) concatenated update lists to
        apply at level i (empty arrays when none) — only for unrolled i;
      * tail — (ga, gb, gd, gk) targeting columns >= ``tail_s`` (the
        dense-tail pre-pass), or None.

    ``unrolled``: set of level indices that will run as unrolled pallas
    programs (scan bodies cannot host per-level static schedules).
    """
    import dataclasses as _dc

    nlev = len(levels)
    if unrolled is None:
        unrolled = set(range(nlev))
    # target column -> level index (in THIS list; -1 = unfactored/Schur)
    ncol = int(blk_col.max()) + 1 if len(blk_col) else 0
    col2li = np.full(ncol, -1, np.int64)
    for li, lv in enumerate(levels):
        col2li[lv.cols] = li

    inc = [[] for _ in range(nlev)]
    tail = [] if tail_s is not None else None
    reduced = []
    for li, lv in enumerate(levels):
        gd = lv.gemm_d
        if gd.size == 0:
            reduced.append(lv)
            continue
        tcol = blk_col[gd]
        is_tail = (
            tcol >= tail_s if tail_s is not None
            else np.zeros(gd.size, bool)
        )
        tli = col2li[tcol]
        to_inc = ~is_tail & (tli >= 0) & np.isin(
            tli, np.fromiter(unrolled, np.int64, len(unrolled))
        )
        resid = ~is_tail & ~to_inc
        if tail is not None and is_tail.any():
            tail.append((lv.gemm_a[is_tail], lv.gemm_b[is_tail],
                         gd[is_tail], lv.gemm_k[is_tail]))
        if to_inc.any():
            for t in np.unique(tli[to_inc]):
                m = to_inc & (tli == t)
                inc[int(t)].append(
                    (lv.gemm_a[m], lv.gemm_b[m], gd[m], lv.gemm_k[m],
                     lv.gemm_nondiag[m])
                )
        reduced.append(_dc.replace(
            lv,
            gemm_a=lv.gemm_a[resid], gemm_b=lv.gemm_b[resid],
            gemm_d=gd[resid], gemm_k=lv.gemm_k[resid],
            gemm_nondiag=lv.gemm_nondiag[resid],
        ))

    def _cat(parts, nfields):
        if not parts:
            return tuple(
                np.empty(0, np.int32 if f < 4 else bool)
                for f in range(nfields)
            )
        return tuple(
            np.concatenate([p[f] for p in parts]) for f in range(nfields)
        )

    incoming = [_cat(p, 5) for p in inc]
    tail_out = _cat(tail, 4) if tail is not None else None
    return reduced, incoming, tail_out
