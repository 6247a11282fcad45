"""Pallas TPU kernels for the factorization hot path.

The E2 trailing update (reference ``src/sopalin/src/sopalin3d.c`` GEMM +
scatter-add task — SURVEY.md section 2 row 9) dominates factorization
flops.  The XLA baseline (kernels.py) materializes gathered (ng,T,T)
copies of both operands plus a scatter — 4 extra HBM passes.  This fused
kernel streams tiles by index directly from the pool in HBM:

  * contribution triples (a, b, dst) are pre-sorted by dst;
  * the grid walks triples sequentially (TPU grid order is sequential);
  * each dst tile is DMA'd into a VMEM accumulator at its first triple,
    updated with one MXU dot per triple, and written back at its last —
    so every a/b tile is read once and every dst tile is read+written
    exactly once: the HBM-traffic lower bound for this schedule.

In-place semantics via input_output_aliases (the pool is donated).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import numpy as np

_INTERPRET = False  # set True (or use force_tpu_interpret_mode) off-TPU


def sort_triples(ga, gb, gd, gk=None):
    """Sort contribution triples by destination and emit first/last flags."""
    order = np.argsort(gd, kind="stable")
    ga, gb, gd = ga[order], gb[order], gd[order]
    first = np.empty(gd.size, np.int32)
    last = np.empty(gd.size, np.int32)
    if gd.size:
        first[0] = 1
        first[1:] = gd[1:] != gd[:-1]
        last[-1] = 1
        last[:-1] = gd[1:] != gd[:-1]
    out = [ga, gb, gd, first, last]
    if gk is not None:
        out.append(gk[order])
    return tuple(out)


def _mk_kernel_src(T, cross, scaled, update_dtype, out_dtype):
    """Build the fused gather-GEMM-scatter kernel body."""
    cdt = update_dtype or out_dtype

    def kernel(*args):
        if scaled:
            ga, gb, gd, first, last, gk = args[:6]
            refs = args[6:]
        else:
            ga, gb, gd, first, last = args[:5]
            refs = args[5:]
        refs = refs[1:]  # drop the input pool ref (aliased to out)
        if cross:
            src = refs[0]
            refs = refs[1:]
        if scaled:
            d_ref = refs[0]
            refs = refs[1:]
        out, a_buf, b_buf, acc, sems = refs
        if not cross:
            src = out
        i = pl.program_id(0)

        cp_a = pltpu.make_async_copy(out.at[ga[i]], a_buf, sems.at[0])
        cp_b = pltpu.make_async_copy(src.at[gb[i]], b_buf, sems.at[1])
        cp_a.start()
        cp_b.start()

        @pl.when(first[i] == 1)
        def _():
            cp_d = pltpu.make_async_copy(out.at[gd[i]], acc, sems.at[2])
            cp_d.start()
            cp_d.wait()

        cp_a.wait()
        cp_b.wait()
        a = a_buf[:]
        if scaled:
            a = a * d_ref[gk[i]][None, :]
        b = b_buf[:]
        dn = (((1,), (1,)), ((), ()))
        if update_dtype is not None:
            # explicit low-precision trailing updates (bf16 knob)
            contrib = jax.lax.dot_general(
                a.astype(cdt), b.astype(cdt), dn,
                preferred_element_type=jnp.float32,
            )
        else:
            # fp32 accuracy from bf16 MXU passes: split each operand into
            # bf16 head + bf16 tail and take the three leading products
            # (~Precision.HIGH; Mosaic's HIGHEST lowering wedges the
            # remote compiler, so the split is done by hand)
            a_hi = a.astype(jnp.bfloat16)
            a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            b_hi = b.astype(jnp.bfloat16)
            b_lo = (b - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            f32 = jnp.float32
            contrib = (
                jax.lax.dot_general(a_hi, b_hi, dn, preferred_element_type=f32)
                + jax.lax.dot_general(a_hi, b_lo, dn, preferred_element_type=f32)
                + jax.lax.dot_general(a_lo, b_hi, dn, preferred_element_type=f32)
            )
        acc[:] = acc[:] - contrib.astype(out_dtype)

        @pl.when(last[i] == 1)
        def _():
            cp_o = pltpu.make_async_copy(acc, out.at[gd[i]], sems.at[3])
            cp_o.start()
            cp_o.wait()

    return kernel


def gemm_scatter_fused(
    pool,
    ga,
    gb,
    gd,
    first,
    last,
    gk=None,
    d=None,
    src_pool=None,
    update_dtype=None,
    interpret=None,
):
    """pool[gd] -= op(a) @ b^T fused gather-GEMM-scatter (triples sorted by gd).

    a tiles are read from ``pool``; b tiles from ``src_pool`` if given
    (the LU cross-pool update) else from ``pool``.  With ``d``/``gk``,
    a-columns are scaled by d[gk] (the LDL^T D).  Returns the updated pool
    (same buffer — donated via input_output_aliases).
    """
    if interpret is None:
        interpret = _INTERPRET
    ng = int(ga.shape[0])
    if ng == 0:
        return pool
    T = pool.shape[1]
    cross = src_pool is not None
    scaled = d is not None
    out_dtype = pool.dtype
    kernel = _mk_kernel_src(T, cross, scaled, update_dtype, out_dtype)

    scalars = [
        jnp.asarray(ga, jnp.int32),
        jnp.asarray(gb, jnp.int32),
        jnp.asarray(gd, jnp.int32),
        jnp.asarray(first, jnp.int32),
        jnp.asarray(last, jnp.int32),
    ]
    if scaled:
        scalars.append(jnp.asarray(gk, jnp.int32))
    nsc = len(scalars)

    in_specs = [pl.BlockSpec(memory_space=pl.ANY)]  # pool (aliased)
    operands = [pool]
    if cross:
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        operands.append(src_pool)
    if scaled:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        operands.append(d)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=nsc,
        grid=(ng,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((T, T), out_dtype),
            pltpu.VMEM((T, T), out_dtype),
            pltpu.VMEM((T, T), out_dtype),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(pool.shape, out_dtype),
        input_output_aliases={nsc: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        cost_estimate=pl.CostEstimate(
            flops=2 * ng * T * T * T,
            bytes_accessed=ng * 2 * T * T * out_dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*scalars, *operands)


# ---------------------------------------------------------------------------
# Pipelined fused E2 (round-3): double-buffered DMA, dst prefetch
# ---------------------------------------------------------------------------
#
# The round-2 kernel above waits each step's a/b DMAs immediately after
# starting them, so every grid step serializes issue latency + transfer
# before its one MXU dot — measured at parity with the XLA
# gather-GEMM-scatter (6.1 TF/s bf16, HBM-bound).  This version keeps the
# dst-sorted accumulate-in-VMEM schedule (each dst tile is read+written
# exactly once) and pipelines everything movable:
#
#   * a/b operands: two VMEM slots, step i starts the DMAs for step i+1
#     before waiting its own — transfer rides under the previous compute;
#   * dst accumulators: two VMEM slots keyed by segment parity; the read
#     of segment s+1's dst starts at the FIRST step of segment s, and
#     segment s's write-out is waited by the read of segment s+2 (same
#     slot) or the end-of-kernel drain — boundary stalls collapse to one
#     semaphore wait instead of a full round-trip.
#
# Schedule tables are host-built (build_pipeline_schedule) and chunked so
# the scalar-prefetch arrays stay SMEM-sized; a dst segment split by a
# chunk boundary is simply read+written once per chunk (the second chunk
# re-reads the accumulated value — pallas_call boundaries order the two).
#
# Reference hot loop: the E2 task of sopalin_smp
# (src/sopalin/src/sopalin3d.c) — SURVEY.md section 2 row 9.

_F_FIRST, _F_LAST, _F_WRWAIT, _F_PAR, _F_VALID = 1, 2, 4, 8, 16


def build_pipeline_schedule(ga, gb, gd, gk=None, chunk: int = 8192,
                            group: int = 1, ext_tiles=None):
    """Sort triples by dst and emit per-chunk static schedules.

    Returns a list of dicts with int32 arrays (ga, gb, gd, flags, rd) of
    one chunk's length plus the 2-element end-drain tables (endw, endt).
    ``group``: pairs per grid step in the kernel — chunks are padded to a
    multiple with invalid pairs (flag bit _F_VALID clear, predicated off).
    ``ext_tiles``: sorted pool indices of an externally provided compact
    operand array (the TRSM-produced bf16 panel stream): ga_c/gb_c are
    then positions into it instead of per-chunk uniq gathers.
    """
    order = np.argsort(gd, kind="stable")
    ga = np.asarray(ga, np.int32)[order]
    gb = np.asarray(gb, np.int32)[order]
    gd = np.asarray(gd, np.int32)[order]
    # the pipeline prefetches a/b one step ahead of the dst write-backs:
    # sources and destinations must be disjoint within one level (they are,
    # by the level-set schedule — updates flow strictly to later levels)
    assert not np.intersect1d(gd, np.concatenate([ga, gb])).size, (
        "E2 dst tiles overlap operand tiles within a level"
    )
    if gk is not None:
        gk = np.asarray(gk, np.int32)[order]
    ng = gd.size
    out = []
    for lo in range(0, ng, chunk):
        hi = min(lo + chunk, ng)
        d = gd[lo:hi]
        n = hi - lo
        first = np.empty(n, np.int32)
        first[0] = 1
        first[1:] = d[1:] != d[:-1]
        last = np.empty(n, np.int32)
        last[-1] = 1
        last[:-1] = d[1:] != d[:-1]
        seg = np.cumsum(first) - 1  # segment id per step
        nseg = int(seg[-1]) + 1
        par = seg & 1
        # rd[i]: at the first step of segment s, the dst tile of segment
        # s+1 (sentinel -1 when none; also carries segment 0's own dst at
        # step 0 via the kernel's warm-up special case)
        firsts = np.flatnonzero(first)
        seg_dst = d[firsts]
        rd = np.full(n, -1, np.int32)
        rd[firsts[:-1]] = seg_dst[1:]
        # wr_wait: the read into slot (s+1)%2 must complete segment s-1's
        # pending write on that slot first (its dst is gd[i-1])
        # set at first steps of segments 1..nseg-2: a previous segment
        # exists (its write owns slot (s+1)%2) AND a next read will start
        wr_wait = np.zeros(n, np.int32)
        wr_wait[firsts[1:-1]] = 1
        flags = (
            first * _F_FIRST
            + last * _F_LAST
            + wr_wait * _F_WRWAIT
            + par * _F_PAR
            + _F_VALID
        ).astype(np.int32)
        # end drain: writes of the last two segments are never waited by a
        # later read — wait them (per acc slot) at the final grid step
        endw = np.zeros(2, np.int32)
        endt = np.zeros(2, np.int32)
        p_last = (nseg - 1) & 1
        endw[p_last] = 1
        endt[p_last] = seg_dst[-1]
        if nseg >= 2:
            endw[1 - p_last] = 1
            endt[1 - p_last] = seg_dst[-2]
        t = {
            "ga": ga[lo:hi], "gb": gb[lo:hi], "gd": d,
            "flags": flags, "rd": rd, "endw": endw, "endt": endt,
        }
        if gk is not None:
            t["gk"] = gk[lo:hi]
        gpad = (-n) % group
        if gpad:
            # invalid tail pairs: safe reads (last real tiles), no flags
            # set except the closed segment's parity, predicated off
            for k in ("ga", "gb", "gd", "gk"):
                if k in t:
                    t[k] = np.concatenate(
                        [t[k], np.repeat(t[k][-1:], gpad)]
                    )
            t["flags"] = np.concatenate([
                t["flags"],
                np.full(gpad, int(par[-1]) * _F_PAR, np.int32),
            ])
            t["rd"] = np.concatenate([t["rd"], np.full(gpad, -1, np.int32)])
        t["group"] = group
        if ext_tiles is not None:
            # positions into the TRSM-produced panel stream (both E2
            # operands are post-TRSM panel tiles of the firing level)
            ext = np.asarray(ext_tiles)
            ga_c = np.searchsorted(ext, t["ga"])
            gb_c = np.searchsorted(ext, t["gb"])
            assert (ext[np.minimum(ga_c, ext.size - 1)] == t["ga"]).all()
            assert (ext[np.minimum(gb_c, ext.size - 1)] == t["gb"]).all()
            t["ga_c"] = ga_c.astype(np.int32)
            t["gb_c"] = gb_c.astype(np.int32)
        else:
            # compact operand tables: a/b are gathered into per-chunk dense
            # arrays OUTSIDE the kernel (each tile ONCE — real plans reuse
            # a tile across ~10+ pairs) so the kernel reads small
            # sequential arrays (cast to the update dtype: half the bytes
            # per pair for bf16) and the pool is passed exactly once
            t["uniq_a"] = np.unique(t["ga"])
            t["uniq_b"] = np.unique(t["gb"])
            t["ga_c"] = np.searchsorted(t["uniq_a"], t["ga"]).astype(
                np.int32
            )
            t["gb_c"] = np.searchsorted(t["uniq_b"], t["gb"]).astype(
                np.int32
            )
        out.append(t)
    return out


def _mk_pipelined_kernel(ng, cross, scaled, update_dtype, out_dtype, G=1,
                         ab=False, compact=False, slots=2):
    """ng = padded pair count (multiple of G); grid = ng // G groups.

    G > 1 amortizes the per-grid-step fixed cost (flag decode, DMA issue
    bookkeeping) over G pairs; invalid tail pads are predicated off via
    the _F_VALID flag bit.  ``slots``: a/b buffer depth — deeper keeps
    more DMAs in flight (helps iff the plateau is transfer latency)."""
    cdt = update_dtype or out_dtype
    ngrp = ng // G
    S = slots

    def kernel(*args):
        if scaled:
            ga, gb, gd, flags, rd, endw, endt, gk = args[:8]
            refs = args[8:]
        else:
            ga, gb, gd, flags, rd, endw, endt = args[:7]
            refs = args[7:]
        refs = refs[1:]  # drop the input pool ref (aliased to out)
        if compact:
            Xa, Xb = refs[0], refs[1]
            refs = refs[2:]
        elif ab:
            AB = refs[0]
            refs = refs[1:]
        elif cross:
            src = refs[0]
            refs = refs[1:]
        if scaled:
            d_ref = refs[0]
            refs = refs[1:]
        out, a_buf, b_buf, acc, asem, bsem, rsem, wsem = refs
        if not cross and not ab and not compact:
            src = out
        i = pl.program_id(0)

        if compact:
            # ga/gb hold COMPACT indices into the per-chunk operand
            # arrays (each tile gathered once outside the kernel)
            def a_cp(grp, u, sl):
                return pltpu.make_async_copy(
                    Xa.at[ga[grp * G + u]], a_buf.at[sl, u], asem.at[sl, u]
                )

            def b_cp(grp, u, sl):
                return pltpu.make_async_copy(
                    Xb.at[gb[grp * G + u]], b_buf.at[sl, u], bsem.at[sl, u]
                )
        elif ab:
            # one descriptor fetches the contiguous (2, T, T) pair slab
            def a_cp(grp, u, sl):
                return pltpu.make_async_copy(
                    AB.at[grp * G + u], a_buf.at[sl, u], asem.at[sl, u]
                )

            def b_cp(grp, u, sl):
                return None
        else:
            def a_cp(grp, u, sl):
                return pltpu.make_async_copy(
                    out.at[ga[grp * G + u]], a_buf.at[sl, u], asem.at[sl, u]
                )

            def b_cp(grp, u, sl):
                return pltpu.make_async_copy(
                    src.at[gb[grp * G + u]], b_buf.at[sl, u], bsem.at[sl, u]
                )

        @pl.when(i == 0)
        def _():
            # warm-up: fill all but the last slot so steady state keeps
            # S-1 groups' DMAs in flight
            for g0 in range(S - 1):
                @pl.when(g0 < ngrp)
                def _(g0=g0):
                    for u in range(G):
                        a_cp(g0, u, g0 % S).start()
                        if not ab:
                            b_cp(g0, u, g0 % S).start()
            # warm-up read of segment 0's dst into its parity slot (0)
            pltpu.make_async_copy(out.at[gd[0]], acc.at[0], rsem.at[0]).start()

        @pl.when(i + S - 1 < ngrp)
        def _():
            sl = (i + S - 1) % S
            for u in range(G):
                a_cp(i + S - 1, u, sl).start()
                if not ab:
                    b_cp(i + S - 1, u, sl).start()

        sl = i % S
        for u in range(G):
            j = i * G + u
            f = flags[j]
            par = (f // _F_PAR) % 2

            @pl.when(f % 2 == 1)  # first step of a segment
            def _(j=j, f=f, par=par):
                # complete this segment's dst read
                pltpu.make_async_copy(
                    out.at[gd[j]], acc.at[par], rsem.at[par]
                ).wait()

                @pl.when(rd[j] >= 0)
                def _():
                    q = 1 - par

                    @pl.when((f // _F_WRWAIT) % 2 == 1)
                    def _():
                        # segment s-1's write still owns slot q; gd[j-1]
                        # is its dst (the step before a first step closed
                        # segment s-1)
                        pltpu.make_async_copy(
                            acc.at[q], out.at[gd[j - 1]], wsem.at[q]
                        ).wait()

                    pltpu.make_async_copy(
                        out.at[rd[j]], acc.at[q], rsem.at[q]
                    ).start()

            a_cp(i, u, sl).wait()
            if not ab:
                b_cp(i, u, sl).wait()

            @pl.when((f // _F_VALID) % 2 == 1)
            def _(j=j, u=u, par=par):
                if ab:
                    a, b = a_buf[sl, u, 0], a_buf[sl, u, 1]
                else:
                    a, b = a_buf[sl, u], b_buf[sl, u]
                if scaled:
                    a = a * d_ref[gk[j]][None, :]
                dn = (((1,), (1,)), ((), ()))
                if update_dtype is not None:
                    contrib = jax.lax.dot_general(
                        a.astype(cdt), b.astype(cdt), dn,
                        preferred_element_type=jnp.float32,
                    )
                else:
                    # ~Precision.HIGH from three bf16 passes (Mosaic's
                    # HIGHEST lowering wedges the remote compiler)
                    a_hi = a.astype(jnp.bfloat16)
                    a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
                    b_hi = b.astype(jnp.bfloat16)
                    b_lo = (b - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)
                    f32 = jnp.float32
                    contrib = (
                        jax.lax.dot_general(a_hi, b_hi, dn,
                                            preferred_element_type=f32)
                        + jax.lax.dot_general(a_hi, b_lo, dn,
                                              preferred_element_type=f32)
                        + jax.lax.dot_general(a_lo, b_hi, dn,
                                              preferred_element_type=f32)
                    )
                acc[par] = acc[par] - contrib.astype(out_dtype)

            @pl.when((f // _F_LAST) % 2 == 1)  # last step of a segment
            def _(j=j, par=par):
                pltpu.make_async_copy(
                    acc.at[par], out.at[gd[j]], wsem.at[par]
                ).start()

        @pl.when(i == ngrp - 1)
        def _():
            for p in range(2):
                @pl.when(endw[p] == 1)
                def _(p=p):
                    pltpu.make_async_copy(
                        acc.at[p], out.at[endt[p]], wsem.at[p]
                    ).wait()

    return kernel


def gemm_scatter_pipelined(
    pool,
    schedule,
    d=None,
    src_pool=None,
    update_dtype=None,
    interpret=None,
    ab_pack=False,
    compact=None,
    slots=None,
    xab=None,
):
    """pool[gd] -= op(a) @ b^T via the pipelined fused kernel.

    ``schedule`` comes from build_pipeline_schedule (host-static chunked
    tables).  a tiles are read from ``pool``; b tiles from ``src_pool`` if
    given (the LU cross-pool update) else from ``pool``.  With ``d``,
    a-columns are scaled by d[gk] (the LDL^T D).  Returns the updated pool
    (same buffer — donated via input_output_aliases).
    """
    if interpret is None:
        interpret = _INTERPRET
    if slots is None:
        import os as _os_s

        # 4 slots keep ~2xGxS DMAs in flight: sub-64KB transfers are
        # LATENCY-bound (~0.95 us round trip) and need depth >= 8 to reach
        # the ~240 GB/s stream rate (exp_dma.py round 4) — this is what
        # converts the bf16 panel stream's halved bytes into time
        slots = int(_os_s.environ.get("PASTIX_E2_SLOTS", "4"))
    if xab is not None:
        # TRSM-produced bf16 panel stream: the compact kernel reads both
        # operands from it at half the bytes, WITHOUT the separate XLA
        # gather pass that ate the compact variant's savings
        # (exp_compact r3 parity; exp_dma r4 shows the kernel is
        # bytes-bound at ~240 GB/s, so halving operand bytes pays once
        # the producer is free)
        compact = True
    elif compact is None:
        # re-measured in r4: the r3 'descriptor-bound' reading of this
        # parity was wrong — the separate gather pass cost what the
        # halved kernel bytes saved (exp_dma.py).  Kept as an opt-in.
        import os as _os

        compact = (
            not ab_pack and _os.environ.get("PASTIX_E2_COMPACT", "0") == "1"
        )
    T = pool.shape[1]
    cross = src_pool is not None
    scaled = d is not None
    out_dtype = pool.dtype
    for t in schedule:
        ng = int(t["ga"].shape[0])
        if ng == 0:
            continue
        G = int(t.get("group", 1))
        kernel = _mk_pipelined_kernel(
            ng, cross and not ab_pack and not compact, scaled,
            update_dtype, out_dtype, G=G, ab=ab_pack, compact=compact,
            slots=slots,
        )
        scalars = [
            jnp.asarray(t["ga_c"] if compact else t["ga"]),
            jnp.asarray(t["gb_c"] if compact else t["gb"]),
            jnp.asarray(t["gd"]), jnp.asarray(t["flags"]),
            jnp.asarray(t["rd"]), jnp.asarray(t["endw"]),
            jnp.asarray(t["endt"]),
        ]
        if scaled:
            scalars.append(jnp.asarray(t["gk"]))
        nsc = len(scalars)

        in_specs = [pl.BlockSpec(memory_space=pl.ANY)]
        operands = [pool]
        if compact:
            if xab is not None:
                Xa, Xb = xab if isinstance(xab, tuple) else (xab, xab)
            else:
                src = src_pool if src_pool is not None else pool
                Xa = pool[jnp.asarray(t["uniq_a"])]
                Xb = src[jnp.asarray(t["uniq_b"])]
                if update_dtype is not None:
                    Xa = Xa.astype(update_dtype)
                    Xb = Xb.astype(update_dtype)
            in_specs += [
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ]
            operands += [Xa, Xb]
        elif ab_pack:
            # contiguous (ng, 2, T, T) pair slabs: ONE descriptor fetches
            # both operands, and the kernel's reads become sequential —
            # trades an extra XLA-gather pass for DMA-issue headroom
            src = src_pool if src_pool is not None else pool
            AB = jnp.stack(
                [pool[jnp.asarray(t["ga"])], src[jnp.asarray(t["gb"])]],
                axis=1,
            )
            if update_dtype is not None:
                # cast at gather time: the kernel then fetches HALF the
                # bytes per pair (the MXU consumes bf16 anyway)
                AB = AB.astype(update_dtype)
            in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
            operands.append(AB)
        elif cross:
            in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
            operands.append(src_pool)
        if scaled:
            in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
            operands.append(d)

        S = slots
        if ab_pack:
            ab_dtype = update_dtype or out_dtype
            buf_shapes = [
                pltpu.VMEM((S, G, 2, T, T), ab_dtype),  # ab pair slots
                pltpu.SMEM((1,), jnp.int32),  # unused b slot placeholder
            ]
        elif compact:
            op_dtype = update_dtype or out_dtype
            buf_shapes = [
                pltpu.VMEM((S, G, T, T), op_dtype),  # a slots (compact X)
                pltpu.VMEM((S, G, T, T), op_dtype),  # b slots (compact X)
            ]
        else:
            buf_shapes = [
                pltpu.VMEM((S, G, T, T), out_dtype),  # a slots
                pltpu.VMEM((S, G, T, T), out_dtype),  # b slots
            ]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=nsc,
            grid=(ng // G,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=buf_shapes + [
                pltpu.VMEM((2, T, T), out_dtype),  # dst accumulators
                pltpu.SemaphoreType.DMA((S, G)),
                pltpu.SemaphoreType.DMA((S, G)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
        pool = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(pool.shape, out_dtype),
            input_output_aliases={nsc: 0},
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            cost_estimate=pl.CostEstimate(
                flops=2 * ng * T * T * T,
                bytes_accessed=ng * 2 * T * T * out_dtype.itemsize,
                transcendentals=0,
            ),
            interpret=interpret,
        )(*scalars, *operands)
    return pool


# ---------------------------------------------------------------------------
# BlockSpec-pipelined fused E2: Mosaic drives the gathers
# ---------------------------------------------------------------------------
#
# The manual-DMA pipeline above tops out ~5 TF/s: each grid step issues
# 4-6 DMA descriptors from the scalar core, and descriptor issue (not
# transfer) becomes the bottleneck at ~0.8 us/step.  This variant instead
# expresses the gathers as scalar-prefetched BlockSpec index_maps and lets
# Mosaic's pipeline emitter do the buffering: a/b/dst blocks are fetched
# by the hardware-managed double-buffered pipeline, and consecutive steps
# whose index_map returns the SAME dst block skip the refetch/rewrite —
# which implements the sorted-segment accumulate for free.

def _mk_blockspec_kernel(scaled, update_dtype, out_dtype):
    cdt = update_dtype or out_dtype

    def kernel(*args):
        if scaled:
            ga, gb, gd, flags, gk = args[:5]
            refs = args[5:]
        else:
            ga, gb, gd, flags = args[:4]
            refs = args[4:]
        if scaled:
            a_ref, b_ref, din_ref, d_ref, out_ref, acc = refs
        else:
            a_ref, b_ref, din_ref, out_ref, acc = refs
        i = pl.program_id(0)
        f = flags[i]

        @pl.when(f % 2 == 1)  # first step of a dst segment
        def _():
            acc[:] = din_ref[0]

        a = a_ref[0]
        if scaled:
            a = a * d_ref[gk[i]][None, :]
        b = b_ref[0]
        dn = (((1,), (1,)), ((), ()))
        if update_dtype is not None:
            contrib = jax.lax.dot_general(
                a.astype(cdt), b.astype(cdt), dn,
                preferred_element_type=jnp.float32,
            )
        else:
            a_hi = a.astype(jnp.bfloat16)
            a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            b_hi = b.astype(jnp.bfloat16)
            b_lo = (b - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            f32 = jnp.float32
            contrib = (
                jax.lax.dot_general(a_hi, b_hi, dn, preferred_element_type=f32)
                + jax.lax.dot_general(a_hi, b_lo, dn, preferred_element_type=f32)
                + jax.lax.dot_general(a_lo, b_hi, dn, preferred_element_type=f32)
            )
        acc[:] = acc[:] - contrib.astype(out_dtype)

        @pl.when((f // _F_LAST) % 2 == 1)  # last step of a dst segment
        def _():
            out_ref[0] = acc[:]

    return kernel


def gemm_scatter_blockspec(
    pool,
    schedule,
    d=None,
    src_pool=None,
    update_dtype=None,
    interpret=None,
):
    """pool[gd] -= op(a) @ b^T with Mosaic-pipelined block gathers.

    Same contract as gemm_scatter_pipelined (schedule from
    build_pipeline_schedule); the dst read-modify-write rides the out/in
    specs' index pipelines, the accumulator lives in VMEM scratch across
    a sorted segment."""
    if interpret is None:
        interpret = _INTERPRET
    T = pool.shape[1]
    scaled = d is not None
    out_dtype = pool.dtype
    for t in schedule:
        ng = int(t["ga"].shape[0])
        if ng == 0:
            continue
        src = src_pool if src_pool is not None else pool
        # compact gathers: the level's operand tiles (post-TRSM panels,
        # disjoint from the dst tiles) — pool itself is passed ONCE
        Xa = pool[jnp.asarray(t["uniq_a"])]
        Xb = src[jnp.asarray(t["uniq_b"])]
        kernel = _mk_blockspec_kernel(scaled, update_dtype, out_dtype)
        scalars = [
            jnp.asarray(t["ga_c"]), jnp.asarray(t["gb_c"]),
            jnp.asarray(t["gd"]), jnp.asarray(t["flags"]),
        ]
        if scaled:
            scalars.append(jnp.asarray(t["gk"]))
        nsc = len(scalars)

        def amap(i, *s):
            return (s[0][i], 0, 0)

        def bmap(i, *s):
            return (s[1][i], 0, 0)

        def dmap(i, *s):
            return (s[2][i], 0, 0)

        blk = lambda m: pl.BlockSpec((1, T, T), m)
        in_specs = [blk(amap), blk(bmap), blk(dmap)]
        operands = [Xa, Xb, pool]
        if scaled:
            in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
            operands.append(d)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=nsc,
            grid=(ng,),
            in_specs=in_specs,
            out_specs=blk(dmap),
            scratch_shapes=[pltpu.VMEM((T, T), out_dtype)],
        )
        pool = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(pool.shape, out_dtype),
            input_output_aliases={nsc + 2: 0},
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            cost_estimate=pl.CostEstimate(
                flops=2 * ng * T * T * T,
                bytes_accessed=ng * 2 * T * T * out_dtype.itemsize,
                transcendentals=0,
            ),
            interpret=interpret,
        )(*scalars, *operands)
    return pool


# ---------------------------------------------------------------------------
# Fused batched Cholesky + triangular inverse (the DIAG latency fix)
# ---------------------------------------------------------------------------
#
# exp_full.py (round 2, v5e): the factorization critical path is NOT the
# update flops — it is the per-level DIAG chain.  XLA expands each level's
# batched lax.linalg.cholesky + triangular_solve(eye) into multiple ~T-step
# loops whose every step round-trips the whole batch through HBM: 35 levels
# cost 126 ms of the 143 ms total (chol alone 68 ms).  This kernel keeps
# one (T, T) tile resident in VMEM and runs the T-step left-looking
# elimination AND unit-inverse build in a single pass of VPU ops — no HBM
# traffic between steps, fp32-exact (no MXU passes involved).
#
# Reference task body: the DIAG factor of sopalin_smp
# (src/sopalin/src/sopalin3d.c), batched per elimination level.


def _chol_inv_kernel(m_ref, l_ref, x_ref, M, Lt):
    """Right-looking Cholesky + inverse over a (G, T, T) tile block.

    Input tiles must be FULL symmetric (not tril'd): symmetry lets every
    column read become a sublane-dynamic ROW read (Mosaic refs only allow
    dynamic indexing on the sublane axis), and the trailing update is an
    outer product — no lane-dynamic access, no reductions beyond the pivot
    pick, two full-array fused multiply-subs per step, all VMEM-resident.
    The inverse accumulates X := E_j^{-1} X (rank-1 row updates), giving
    X = L^{-1} after T steps.
    """
    G, T = m_ref.shape[0], m_ref.shape[1]
    dt = m_ref.dtype
    lane = jax.lax.broadcasted_iota(jnp.int32, (G, 1, T), 2)

    M[:] = m_ref[:]
    eye = (
        jax.lax.broadcasted_iota(jnp.int32, (1, T, T), 1)
        == jax.lax.broadcasted_iota(jnp.int32, (1, T, T), 2)
    ).astype(dt)
    x_ref[:] = jnp.broadcast_to(eye, (G, T, T))

    def body(j, _):
        row = M[:, pl.ds(j, 1), :]  # (G,1,T) == column j by symmetry
        pivsq = jnp.sum(jnp.where(lane == j, row, 0.0), axis=2,
                        keepdims=True)  # (G,1,1)
        piv = jnp.sqrt(pivsq)
        l = row / piv
        lm = jnp.where(lane > j, l, 0.0)  # strictly-below part of col j
        Lt[:, pl.ds(j, 1), :] = jnp.where(lane == j, piv, lm)
        lmT = jnp.swapaxes(lm, 1, 2)  # (G,T,1) sublane mask i > j
        M[:] = M[:] - lmT * lm  # trailing symmetric rank-1 update
        Xrow = x_ref[:, pl.ds(j, 1), :]  # (G,1,T)
        x_ref[:] = x_ref[:] - (lmT / piv) * Xrow
        x_ref[:, pl.ds(j, 1), :] = Xrow / piv
        return 0

    jax.lax.fori_loop(0, T, body, 0)
    l_ref[:] = jnp.swapaxes(Lt[:], 1, 2)


@functools.partial(jax.jit, static_argnames=("interpret", "block"))
def chol_inv_pallas(tiles: jax.Array, interpret=None, block: int = 16):
    """Batched fused lower Cholesky + L^{-1} of (B, T, T) fp32 tiles.

    ``tiles`` must hold FULL symmetric tiles (use _sym_lower on the
    lower-stored pool tiles).  Processes ``block`` tiles per grid program,
    resident in VMEM for the whole T-step elimination — replacing XLA's
    cholesky + triangular-solve expander loops whose every step round-trips
    the batch through HBM (exp_prof.py: 88 ms of the 144 ms bench
    factorization).  Real dtypes only.  Returns (L, Linv), lower-triangular.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, T, _ = tiles.shape
    G = max(1, min(block, B))
    pad = (-B) % G
    if pad:
        eye = jnp.broadcast_to(jnp.eye(T, dtype=tiles.dtype), (pad, T, T))
        tiles = jnp.concatenate([tiles, eye])
    Bp = B + pad
    spec = pl.BlockSpec((G, T, T), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    L, X = pl.pallas_call(
        _chol_inv_kernel,
        grid=(Bp // G,),
        in_specs=[spec],
        out_specs=(spec, spec),
        out_shape=(
            jax.ShapeDtypeStruct((Bp, T, T), tiles.dtype),
            jax.ShapeDtypeStruct((Bp, T, T), tiles.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((G, T, T), tiles.dtype),
            pltpu.VMEM((G, T, T), tiles.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * Bp * T * T * T // 3,
            bytes_accessed=3 * Bp * T * T * tiles.dtype.itemsize,
            transcendentals=Bp * T,
        ),
        interpret=interpret or _INTERPRET,
    )(tiles)
    return L[:B], X[:B]


def _chol_inv_pool_kernel_factory(T, G, npool):
    def kernel(dpad_ref, pool_in, pool_out, dinv_ref, M, Lt, sems):
        del pool_in  # aliased to pool_out
        i = pl.program_id(0)

        # DMA the block's diagonal tiles from the pool in HBM
        for g in range(G):
            idx = jnp.minimum(dpad_ref[i * G + g], npool - 1)

            @pl.when(dpad_ref[i * G + g] < npool)
            def _(idx=idx, g=g):
                cp = pltpu.make_async_copy(
                    pool_out.at[idx], M.at[g], sems.at[g]
                )
                cp.start()
                cp.wait()

        # symmetrize the lower-stored tile (upper holds scatter garbage)
        ar = jax.lax.broadcasted_iota(jnp.int32, (G, T, T), 1)
        ac = jax.lax.broadcasted_iota(jnp.int32, (G, T, T), 2)
        lo = jnp.where(ar >= ac, M[:], 0.0)
        M[:] = lo + jnp.where(ar < ac, jnp.swapaxes(lo, 1, 2), 0.0)

        lane = jax.lax.broadcasted_iota(jnp.int32, (G, 1, T), 2)

        def body(j, _):
            row = M[:, pl.ds(j, 1), :]
            pivsq = jnp.sum(jnp.where(lane == j, row, 0.0), axis=2,
                            keepdims=True)
            piv = jnp.sqrt(pivsq)
            l = row / piv
            lm = jnp.where(lane > j, l, 0.0)
            Lt[:, pl.ds(j, 1), :] = jnp.where(lane == j, piv, lm)
            lmT = jnp.swapaxes(lm, 1, 2)
            M[:] = M[:] - lmT * lm
            Xrow = dinv_ref[:, pl.ds(j, 1), :]
            dinv_ref[:] = dinv_ref[:] - (lmT / piv) * Xrow
            dinv_ref[:, pl.ds(j, 1), :] = Xrow / piv
            return 0

        eye = (
            jax.lax.broadcasted_iota(jnp.int32, (1, T, T), 1)
            == jax.lax.broadcasted_iota(jnp.int32, (1, T, T), 2)
        ).astype(M.dtype)
        dinv_ref[:] = jnp.broadcast_to(eye, (G, T, T))
        jax.lax.fori_loop(0, T, body, 0)

        # write L = Lt^T back into the pool in place (pads skipped)
        M[:] = jnp.swapaxes(Lt[:], 1, 2)
        for g in range(G):
            idx = jnp.minimum(dpad_ref[i * G + g], npool - 1)

            @pl.when(dpad_ref[i * G + g] < npool)
            def _(idx=idx, g=g):
                cp = pltpu.make_async_copy(
                    M.at[g], pool_out.at[idx], sems.at[G + g]
                )
                cp.start()
                cp.wait()

    return kernel


def chol_inv_pool_pallas(pool, diag_idx, interpret=None, block: int = 8):
    """In-place batched Cholesky + inverse of the pool's diagonal tiles.

    The pool is ALIASED through the kernel (input_output_aliases) so the
    surrounding XLA program keeps its in-place buffer chain — gathering
    the tiles XLA-side and scattering the factors back was measured to
    forfeit the kernel's whole win to pool copies.  ``diag_idx`` (host
    numpy, padded with >= npool sentinels to a multiple of ``block``)
    selects the tiles; returns (pool', dinv) with dinv[k] = L_k^{-1}.
    Symmetrization of the lower-stored tiles happens in-kernel.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    npool, T = pool.shape[0], pool.shape[1]
    nd = diag_idx.shape[0]
    G = max(1, min(block, nd))
    assert nd % G == 0, "pad diag_idx to a multiple of block"
    kernel = _chol_inv_pool_kernel_factory(T, G, npool)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nd // G,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((G, T, T), lambda i, s: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((G, T, T), pool.dtype),
            pltpu.VMEM((G, T, T), pool.dtype),
            pltpu.SemaphoreType.DMA((2 * G,)),
        ],
    )
    pool2, dinv = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct(pool.shape, pool.dtype),
            jax.ShapeDtypeStruct((nd, T, T), pool.dtype),
        ),
        input_output_aliases={1: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        cost_estimate=pl.CostEstimate(
            flops=2 * nd * T * T * T // 3,
            bytes_accessed=3 * nd * T * T * pool.dtype.itemsize,
            transcendentals=nd * T,
        ),
        interpret=interpret or _INTERPRET,
    )(jnp.asarray(diag_idx, jnp.int32), pool)
    return pool2, dinv
