"""Panel-slab E2 kernel: descriptor-amortized, row-bounded trailing updates.

The pipelined pair kernel (pallas_kernels.gemm_scatter_pipelined) is
DMA-descriptor-bound: ~2 descriptors per 4.2 MFLOP pair cap it at ~6 TF/s
on the v5e (exp_pipe/exp_compact, round 3).  This kernel exploits two
structural facts of the tile layout:

  1. **Panels are contiguous in the pool.**  ``SolverLayout.keys`` sorts
     tiles by (col, row), so the off-diagonal tiles of block column K
     occupy one contiguous index range.  Both E2 operands of a pair
     (a = L(I,K), b = L(J,K)) are tiles of the same panel: fetching
     C-tile panel chunks with ONE descriptor each serves ~C pairs per a
     fetch and ~C per b fetch.

  2. **Destinations cluster in contiguous windows.**  dst = (I, J) tiles
     of later columns; sorted by dst, consecutive pairs land within a few
     tiles of each other near the top of the tree (97.7% of flagship
     pairs fit fixed 64-tile windows — exp_slab2.py).  An H-tile window
     is read once, accumulated in VMEM across every pair that lands in
     it, and written once.

  Net descriptors: ~2/C (slabs) + ~2/(pairs-per-window) ≈ 0.3/pair.

  3. **Row-bounded sub-matmuls** (the splitpart / IPARM_MIN_BLOCKSIZE
     analog at sub-tile granularity, reference src/blend/src/splitpart.c):
     the MXU streams sublane rows, so a (ha, T) x (T, T) product costs
     ha/T of the full tile.  Per-tile conservative scalar row-support
     bounds (analyze.blocksym.tile_row_bounds) shrink each pair's ``a``
     operand to its support window, quantized to ha in {32, 64, 96, 128}
     — converting row-padding flops (the dominant padding term,
     exp_pad.py) into real time.  The skipped rows are structural zeros
     of the panel, so their contribution rows are exactly zero.

Reference hot loop: the E2 GEMM task of sopalin_smp
(src/sopalin/src/sopalin3d.c) — there a whole-panel BLAS3 GEMM; this is
the TPU-native equivalent schedule.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import numpy as np

_INTERPRET = False

# flag bits (packed with the offsets into one int32 word per pair)
_B_VALID = 1 << 0
_B_WFIRST = 1 << 1
_B_WLAST = 1 << 2
_B_RDSELF = 1 << 3   # window read was not prefetched: start+wait it here
_B_WWPREF = 1 << 4   # before prefetching next window: wait write on that slot
_B_WWSELF = 1 << 5   # before RDSELF read: wait write on own slot
_B_WPAR = 1 << 6
_B_AFIRST = 1 << 7
_B_APAR = 1 << 8
_B_BFIRST = 1 << 9
_B_BPAR = 1 << 10
_SH_IA = 11   # 4 bits
_SH_IB = 15   # 4 bits
_SH_IW = 19   # 6 bits
_SH_R0 = 25   # 4 bits (r0 / 8)
_SH_HC = 29   # 2 bits (ha = 32 * (hcls + 1))


@dataclasses.dataclass
class SlabPlan:
    """Host-built static schedule for one level's slab E2 call."""

    chunks: list          # per-chunk dict of int32 scalar tables
    fallback: tuple       # (ga, gb, gd, gk) pairs for the pair kernel
    C: int
    H: int
    G: int
    stats: dict

    @property
    def n_slab_pairs(self) -> int:
        return int(self.stats["pairs_slab"])


def _sim_windows(win_starts: np.ndarray, H: int):
    """Simulate the 2-slot window state machine for one chunk.

    Per site m (first pair of window m), kernel order is:
      1. if WWPREF: wait the other slot's outstanding write (= write m-1)
      2. if RDSELF: start own read (prefetch was withheld)
      3. wait own read
      4. if wnx >= 0: start window m+1's read into the other slot
    Writes start at each window's last pair; every write is waited exactly
    once (a later site's WWPREF or the end drain).  A window overlapping
    its predecessor's interval (the pool-end clamp case) must not be read
    until that write completes — its read is deferred (RDSELF) and the
    site's WWPREF wait provides the ordering.

    Returns (wpar, rdself, wwpref, wnx_w, endw, endt).
    """
    nw = win_starts.size
    wpar = np.arange(nw) % 2
    rdself = np.zeros(nw, bool)
    wwpref = np.zeros(nw, bool)
    wnx_w = np.full(nw, -1, np.int64)
    ow = [None, None]  # outstanding (un-waited) write per slot
    pref = np.zeros(nw, bool)
    pref[0] = True  # warm-up read
    for m in range(nw):
        s = m % 2
        if ow[1 - s] is not None:
            wwpref[m] = True
            ow[1 - s] = None
        assert ow[s] is None, "slot reused with outstanding write"
        if not pref[m]:
            rdself[m] = True
        if m + 1 < nw:
            if win_starts[m + 1] >= win_starts[m] + H:
                pref[m + 1] = True
                wnx_w[m] = win_starts[m + 1]
            # else: overlap — defer m+1's read to its own site, where the
            # WWPREF wait for write m orders it
        ow[s] = m
    endw = np.zeros(2, np.int32)
    endt = np.zeros(2, np.int32)
    for s in range(2):
        if ow[s] is not None:
            endw[s] = 1
            endt[s] = int(win_starts[ow[s]])
    return wpar, rdself, wwpref, wnx_w, endw, endt


def build_slab_plan(
    ga,
    gb,
    gd,
    gk,
    diag_of_col,
    npool: int,
    *,
    C: int = 16,
    H: int = 32,
    G: int = 4,
    chunk: int = 4096,
    min_panel: int = 6,
    rbounds=None,
    T: int = 128,
) -> SlabPlan:
    """Build the slab schedule for one level's E2 pairs.

    ``rbounds``: optional (rlo, rhi) int arrays over pool tiles (from
    tile_row_bounds matched to the layout keys); None disables row
    bounding (full-height pairs).  Pairs whose source panel is shorter
    than ``min_panel`` tiles (slab fetches would not amortize) go to the
    ``fallback`` list for the pair kernel.
    """
    assert C <= 16 and H <= 64
    ga = np.asarray(ga, np.int64)
    gb = np.asarray(gb, np.int64)
    gd = np.asarray(gd, np.int64)
    gk = np.asarray(gk, np.int64)
    n = ga.size
    stats = dict(pairs_slab=0, pairs_fb=n, desc=0, windows=0, slabs=0,
                 flop_frac=1.0, bytes=0)
    if n == 0 or npool < max(H, C):
        return SlabPlan([], (ga, gb, gd, gk), C, H, G, stats)

    ps = diag_of_col[gk] + 1  # panel start pool index per pair
    ia_all = ga - ps
    # panel length per pair (max a-offset over the pair's source column)
    mcol = np.zeros(int(gk.max()) + 1, np.int64)
    np.maximum.at(mcol, gk, ia_all + 1)
    np.maximum.at(mcol, gk, gb - ps + 1)
    if C == 0:  # adaptive: match the slab size to the panel lengths
        m_med = int(np.median(mcol[gk]))
        C = 4 if m_med < 8 else (8 if m_med < 20 else 16)
    if H == 0:
        H = min(4 * C, 64)
    fb_mask = mcol[gk] < min_panel
    fb = (ga[fb_mask], gb[fb_mask], gd[fb_mask], gk[fb_mask])
    keep = ~fb_mask
    if not keep.any():
        return SlabPlan([], fb, C, H, G, stats)
    ga, gb, gd, gk, ps = ga[keep], gb[keep], gd[keep], gk[keep], ps[keep]
    n = ga.size

    # greedy dst windows over the sorted destinations: each window starts
    # at a cluster's first tile, so fragmented dst regions (leaf levels)
    # are hugged instead of blanketed by a fixed grid (measured 3x window
    # over-read with grid-aligned windows).  Windows are disjoint by
    # construction; only the pool-end clamp can overlap (handled by the
    # slot simulation's deferred read).
    du = np.unique(gd)
    w0u = np.empty(du.size, np.int64)
    cur = du[0]
    for t in range(du.size):
        if du[t] >= cur + H:
            cur = du[t]
        w0u[t] = cur
    w0 = np.minimum(w0u[np.searchsorted(du, gd)], npool - H)
    a0 = np.minimum(ps + ((ga - ps) // C) * C, npool - C)
    b0 = np.minimum(ps + ((gb - ps) // C) * C, npool - C)
    order = np.lexsort((gb, b0, a0, w0))
    ga, gb, gd, gk = ga[order], gb[order], gd[order], gk[order]
    w0, a0, b0 = w0[order], a0[order], b0[order]
    iw = (gd - w0).astype(np.int64)
    ia = (ga - a0).astype(np.int64)
    ib = (gb - b0).astype(np.int64)
    assert (iw < H).all() and (ia < C).all() and (ib < C).all()
    assert (iw >= 0).all() and (ia >= 0).all() and (ib >= 0).all()

    # row bounds -> (r0/8, hcls) per pair; quantum q = T/4 gives height
    # classes {q, 2q, 3q, T} (32/64/96/128 at the production tile size)
    q = T // 4 if (T % 4 == 0 and T >= 32) else T
    if rbounds is not None and 4 * q == T:
        rlo = np.asarray(rbounds[0], np.int64)[ga]
        rhi = np.asarray(rbounds[1], np.int64)[ga]
        r0 = (rlo // 8) * 8
        need = np.maximum(rhi - r0 + 1, 1)
        hcls = np.minimum((need - 1) // q, 3)
        ha = q * (hcls + 1)
        r0 = np.minimum(r0, T - ha)
    else:
        r0 = np.zeros(n, np.int64)
        hcls = np.full(n, 3, np.int64)
        ha = np.full(n, T, np.int64)

    chunks = []
    tot_desc = 0
    tot_windows = 0
    tot_slabs = 0
    tot_bytes = 0.0
    gk_arr = gk
    for lo in range(0, n, chunk):
        hi = min(lo + chunk, n)
        m = hi - lo
        cw0 = w0[lo:hi]
        ca0 = a0[lo:hi]
        cb0 = b0[lo:hi]
        cgk = gk_arr[lo:hi]
        wfirst = np.empty(m, bool)
        wfirst[0] = True
        wfirst[1:] = cw0[1:] != cw0[:-1]
        wlast = np.empty(m, bool)
        wlast[-1] = True
        wlast[:-1] = wfirst[1:]
        # a-slab runs break on a0 OR source-column change (a clamp at the
        # pool end can give two columns the same a0; the LDL^T slab-level
        # D-scaling needs one column per run)
        afirst = np.empty(m, bool)
        afirst[0] = True
        afirst[1:] = (ca0[1:] != ca0[:-1]) | (cgk[1:] != cgk[:-1])
        bfirst = np.empty(m, bool)
        bfirst[0] = True
        bfirst[1:] = (cb0[1:] != cb0[:-1]) | afirst[1:]
        firsts = np.flatnonzero(wfirst)
        win_starts = cw0[firsts]
        wpar_w, rdself_w, wwpref_w, wnx_w, endw, endt = _sim_windows(
            win_starts, H
        )

        apar = (np.cumsum(afirst) - 1) % 2
        bpar = (np.cumsum(bfirst) - 1) % 2
        wid = np.cumsum(wfirst) - 1
        pack = (
            _B_VALID
            + wfirst * _B_WFIRST
            + wlast * _B_WLAST
            + (rdself_w[wid] & wfirst) * _B_RDSELF
            + (wwpref_w[wid] & wfirst) * _B_WWPREF
            + wpar_w[wid] * _B_WPAR
            + afirst * _B_AFIRST
            + apar * _B_APAR
            + bfirst * _B_BFIRST
            + bpar * _B_BPAR
            + (ia[lo:hi] << _SH_IA)
            + (ib[lo:hi] << _SH_IB)
            + (iw[lo:hi] << _SH_IW)
            + ((r0[lo:hi] // 8) << _SH_R0)
            + (hcls[lo:hi] << _SH_HC)
        ).astype(np.int64)
        assert (pack < (1 << 31)).all()
        pack = pack.astype(np.int32)
        wnx = np.full(m, -1, np.int32)
        wnx[firsts] = wnx_w
        anx = np.full(m, -1, np.int32)
        af = np.flatnonzero(afirst)
        anx[af[:-1]] = ca0[af[1:]]
        bnx = np.full(m, -1, np.int32)
        bf = np.flatnonzero(bfirst)
        bnx[bf[:-1]] = cb0[bf[1:]]
        t = {
            "pack": pack,
            "wcur": cw0.astype(np.int32),
            "wnx": wnx,
            "acur": ca0.astype(np.int32),
            "anx": anx,
            "bcur": cb0.astype(np.int32),
            "bnx": bnx,
            "endw": endw,
            "endt": endt,
            "gk": gk[lo:hi].astype(np.int32),
        }
        gpad = (-m) % G
        if gpad:
            for key in ("wcur", "acur", "bcur", "gk"):
                t[key] = np.concatenate([t[key], np.repeat(t[key][-1:], gpad)])
            t["pack"] = np.concatenate(
                [t["pack"], np.zeros(gpad, np.int32)]
            )
            for key in ("wnx", "anx", "bnx"):
                t[key] = np.concatenate([t[key], np.full(gpad, -1, np.int32)])
        chunks.append(t)
        nw = firsts.size
        tot_windows += nw
        tot_slabs += int(afirst.sum() + bfirst.sum())
        tot_desc += 2 * nw + int(afirst.sum() + bfirst.sum())
        tot_bytes += (2.0 * nw * H + afirst.sum() * C + bfirst.sum() * C) * (
            T * T * 4
        )
    flop_frac = float(ha.sum()) / (T * n) if n else 1.0
    stats.update(
        pairs_slab=n,
        pairs_fb=int(fb[0].size),
        desc=tot_desc,
        windows=tot_windows,
        slabs=tot_slabs,
        flop_frac=flop_frac,
        bytes=tot_bytes,
    )

    # cost-model gate: use the slab schedule only where it beats the pair
    # kernel's estimate.  v5e-measured constants (exp_dma.py, round 4):
    # kernel-issued DMAs run at ~240 GB/s FLAT from 64 KB to 2 MB with
    # ~50 ns/descriptor — the E2 wall is BYTES MOVED, not descriptor
    # issue (round 3's inference corrected).  The slab schedule only wins
    # where its window+slab bytes undercut the pair kernel's ~2.2
    # tiles/pair, which greedy windows rarely achieve — the dst-block
    # kernel (block_kernels.py) is the byte-efficient schedule.
    import os as _os

    gate = float(_os.environ.get("PASTIX_SLAB_GATE", "1.0"))
    if gate > 0 and n:
        t_desc, bw, mxu = 50e-9, 240e9, 120e12
        tile_b = T * T * 4
        seg = n / max(1, np.unique(gd).size)
        t_pair = max(2.0 * t_desc, (2.0 + 2.0 / seg) * tile_b / bw)
        t_slab = max(
            tot_desc / n * t_desc,
            tot_bytes / n / bw,
            flop_frac * 2.0 * T ** 3 / mxu,
        )
        stats["t_pair_est"] = t_pair
        stats["t_slab_est"] = t_slab
        if t_slab > gate * t_pair:
            fb_all = (
                np.concatenate([fb[0], ga]),
                np.concatenate([fb[1], gb]),
                np.concatenate([fb[2], gd]),
                np.concatenate([fb[3], gk]),
            )
            stats.update(pairs_slab=0, pairs_fb=int(fb_all[0].size),
                         gated_off=True)
            return SlabPlan([], fb_all, C, H, G, stats)
    return SlabPlan(chunks, fb, C, H, G, stats)


def _mk_slab_kernel(ng, C, H, G, scaled, update_dtype, out_dtype, T):
    """ng = padded pair count (multiple of G); grid = ng // G steps."""
    cdt = update_dtype or out_dtype
    ngrp = ng // G

    def kernel(*args):
        if scaled:
            pack, wcur, wnx, acur, anx, bcur, bnx, endw, endt, gk = args[:10]
            refs = args[10:]
        else:
            pack, wcur, wnx, acur, anx, bcur, bnx, endw, endt = args[:9]
            refs = args[9:]
        refs = refs[1:]  # drop the input pool ref (aliased to out)
        if scaled:
            d_ref = refs[0]
            refs = refs[1:]
        out, aslab, bslab, win, asem, bsem, rsem, wsem = refs
        i = pl.program_id(0)

        def rd_win(addr, slot):
            return pltpu.make_async_copy(
                out.at[pl.ds(addr, H)], win.at[slot], rsem.at[slot]
            )

        def wr_win(addr, slot):
            return pltpu.make_async_copy(
                win.at[slot], out.at[pl.ds(addr, H)], wsem.at[slot]
            )

        def rd_a(addr, slot):
            return pltpu.make_async_copy(
                out.at[pl.ds(addr, C)], aslab.at[slot], asem.at[slot]
            )

        def rd_b(addr, slot):
            return pltpu.make_async_copy(
                out.at[pl.ds(addr, C)], bslab.at[slot], bsem.at[slot]
            )

        @pl.when(i == 0)
        def _():
            f0 = pack[0]
            rd_a(acur[0], (f0 // _B_APAR) % 2).start()
            rd_b(bcur[0], (f0 // _B_BPAR) % 2).start()
            rd_win(wcur[0], (f0 // _B_WPAR) % 2).start()

        for u in range(G):
            j = i * G + u
            f = pack[j]
            wpar = (f // _B_WPAR) % 2
            apar = (f // _B_APAR) % 2
            bpar = (f // _B_BPAR) % 2

            @pl.when((f // _B_WFIRST) % 2 == 1)
            def _(j=j, f=f, wpar=wpar):
                # 1. the once-only other-slot write wait (write of window
                #    m-1, whose last pair is j-1); orders both the slot
                #    recycle for the m+1 prefetch AND any deferred read
                #    overlapping window m-1's interval
                @pl.when((f // _B_WWPREF) % 2 == 1)
                def _():
                    wr_win(wcur[j - 1], 1 - wpar).wait()

                # 2. deferred read (prefetch was withheld by the planner)
                @pl.when((f // _B_RDSELF) % 2 == 1)
                def _():
                    rd_win(wcur[j], wpar).start()

                # 3. own read complete
                rd_win(wcur[j], wpar).wait()

                # 4. prefetch window m+1 into the freed slot
                @pl.when(wnx[j] >= 0)
                def _():
                    rd_win(wnx[j], 1 - wpar).start()

            @pl.when((f // _B_AFIRST) % 2 == 1)
            def _(j=j, f=f, apar=apar):
                rd_a(acur[j], apar).wait()
                if scaled:
                    aslab[apar] = (
                        aslab[apar] * d_ref[gk[j]][None, None, :]
                    )

                @pl.when(anx[j] >= 0)
                def _():
                    rd_a(anx[j], 1 - apar).start()

            @pl.when((f // _B_BFIRST) % 2 == 1)
            def _(j=j, f=f, bpar=bpar):
                rd_b(bcur[j], bpar).wait()

                @pl.when(bnx[j] >= 0)
                def _():
                    rd_b(bnx[j], 1 - bpar).start()

            @pl.when((f // _B_VALID) % 2 == 1)
            def _(j=j, f=f, wpar=wpar, apar=apar, bpar=bpar):
                ia = (f // (1 << _SH_IA)) % 16
                ib = (f // (1 << _SH_IB)) % 16
                iw = (f // (1 << _SH_IW)) % 64
                r0 = ((f // (1 << _SH_R0)) % 16) * 8
                hcls = (f // (1 << _SH_HC)) % 4
                b = bslab[bpar, ib]
                dn = (((1,), (1,)), ((), ()))

                def upd(ha):
                    a = aslab[apar, ia, pl.ds(r0, ha), :]
                    if update_dtype is not None:
                        contrib = jax.lax.dot_general(
                            a.astype(cdt), b.astype(cdt), dn,
                            preferred_element_type=jnp.float32,
                        )
                    else:
                        # ~Precision.HIGH via three bf16 passes (Mosaic's
                        # HIGHEST lowering wedges the remote compiler)
                        a_hi = a.astype(jnp.bfloat16)
                        a_lo = (a - a_hi.astype(jnp.float32)).astype(
                            jnp.bfloat16
                        )
                        b_hi = b.astype(jnp.bfloat16)
                        b_lo = (b - b_hi.astype(jnp.float32)).astype(
                            jnp.bfloat16
                        )
                        f32 = jnp.float32
                        contrib = (
                            jax.lax.dot_general(
                                a_hi, b_hi, dn, preferred_element_type=f32
                            )
                            + jax.lax.dot_general(
                                a_hi, b_lo, dn, preferred_element_type=f32
                            )
                            + jax.lax.dot_general(
                                a_lo, b_hi, dn, preferred_element_type=f32
                            )
                        )
                    win[wpar, iw, pl.ds(r0, ha), :] = win[
                        wpar, iw, pl.ds(r0, ha), :
                    ] - contrib.astype(out_dtype)

                q = T // 4 if (T % 4 == 0 and T >= 32) else T
                sizes = (
                    [q, 2 * q, 3 * q, 4 * q] if 4 * q == T else [T] * 4
                )
                jax.lax.switch(
                    hcls, [lambda s=s: upd(s) for s in sizes]
                )

            @pl.when((f // _B_WLAST) % 2 == 1)
            def _(j=j, wpar=wpar):
                wr_win(wcur[j], wpar).start()

        @pl.when(i == ngrp - 1)
        def _():
            for p in range(2):
                @pl.when(endw[p] == 1)
                def _(p=p):
                    wr_win(endt[p], p).wait()

    return kernel


def gemm_scatter_slab(
    pool,
    plan: SlabPlan,
    d=None,
    update_dtype=None,
    interpret=None,
):
    """pool[window] -= a_slab_rows @ b_slab_tile^T over the slab schedule.

    Same numerical contract as gemm_scatter_pipelined for the slab-covered
    pairs; the plan's ``fallback`` pairs must be run separately through
    the pair kernel (factorize drivers do this).  The pool is donated via
    input_output_aliases.
    """
    if interpret is None:
        interpret = _INTERPRET
    scaled = d is not None
    out_dtype = pool.dtype
    T = pool.shape[1]
    C, H, G = plan.C, plan.H, plan.G
    for t in plan.chunks:
        ng = int(t["pack"].shape[0])
        if ng == 0:
            continue
        kernel = _mk_slab_kernel(
            ng, C, H, G, scaled, update_dtype, out_dtype, T
        )
        scalars = [
            jnp.asarray(t["pack"]), jnp.asarray(t["wcur"]),
            jnp.asarray(t["wnx"]), jnp.asarray(t["acur"]),
            jnp.asarray(t["anx"]), jnp.asarray(t["bcur"]),
            jnp.asarray(t["bnx"]), jnp.asarray(t["endw"]),
            jnp.asarray(t["endt"]),
        ]
        if scaled:
            scalars.append(jnp.asarray(t["gk"]))
        nsc = len(scalars)
        in_specs = [pl.BlockSpec(memory_space=pl.ANY)]
        operands = [pool]
        if scaled:
            in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
            operands.append(d)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=nsc,
            grid=(ng // G,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.VMEM((2, C, T, T), out_dtype),   # a slabs
                pltpu.VMEM((2, C, T, T), out_dtype),   # b slabs
                pltpu.VMEM((2, H, T, T), out_dtype),   # dst windows
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
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
                bytes_accessed=2 * ng * T * T * out_dtype.itemsize,
                transcendentals=0,
            ),
            interpret=interpret,
        )(*scalars, *operands)
    return pool
