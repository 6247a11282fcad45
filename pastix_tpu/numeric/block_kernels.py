"""Dst-block-resident E2 kernel: the byte-minimal trailing-update schedule.

exp_dma.py (round 4) measured the actual E2 wall: kernel DMAs run at
~240 GB/s flat in transfer size with ~50 ns descriptor cost — the pair
kernel's ~0.6 us/pair IS its ~2.2 tiles/pair of HBM traffic.  The only
way to go faster is to move fewer bytes per pair, which requires operand
REUSE in VMEM — i.e. proper blocked GEMM:

  * a dst block = the stored tiles of a B_I x B_J rectangle of the tile
    grid, held in VMEM across ALL contributing panels: dst traffic
    ~ 2/n_contrib tiles per pair;
  * per contributing panel K, ONE entry: fetch K's tile run intersecting
    the block's rows (a-slab, <= B_I tiles) and its run intersecting the
    block's columns (b-slab, <= B_J tiles) — both contiguous in the pool
    (panels are (col,row)-sorted) — and compute EVERY cross product in
    one MXU dot: contrib = a_slab @ b_slab^T, whose (i, j) TxT sub-block
    is exactly the update for dst tile (row_i, row_j).  Operand traffic
    ~ (1/B_J + 1/B_I) tiles per pair.

  Net ~0.4-0.6 tiles/pair vs the pair kernel's 2.2 — a 3-5x byte cut —
  with MXU-shaped (up to 1024x128x512) dots.

Per-column dst IO uses exact size-class segments ({1,2,4,8} tiles) so
write-backs never touch tiles outside the block (no cross-block write
races); VMEM scatter of contrib sub-blocks uses the same class trick on
the sublane axis.  Blocks are disjoint by construction, so the 2-slot
read/compute/write pipeline needs no overlap analysis.

This is the TPU-native form of the reference's whole-panel BLAS3 E2
(src/sopalin/src/sopalin3d.c GEMM task): the reference tiles by panel,
this tiles by destination block — the right axis when the accumulator
must live in VMEM.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import numpy as np

_INTERPRET = False

# entry flag word layout
_E_VALID = 1 << 0
_E_BFIRST = 1 << 1   # first entry of a dst block
_E_BLAST = 1 << 2    # last entry of a dst block
_E_WWPREF = 1 << 3   # wait other slot's write before prefetching next read
_E_BPAR = 1 << 4     # dst block slot parity
_E_APAR = 1 << 5     # a/b slab slot parity (per-entry alternating)
_SH_HA = 6           # 2 bits: a-slab class index (sizes _ACLS)
_SH_HB = 8           # 1 bit: b-slab class index (sizes _BCLS)

_ACLS = (2, 4, 8)
_BCLS = (2, 4)
_SEG = (1, 2, 4, 8)  # dst io / scatter size classes (tiles / tile-rows)
_MAXIO = 12          # max dst io segments per block (B_J cols x 3 segs)


def _pack_ptr(ptr, cnt):
    assert ptr < (1 << 24) and cnt < (1 << 7)
    return np.int32(ptr + (cnt << 24))


def _seg_cover(length):
    """Greedy exact cover of `length` with _SEG classes (descending)."""
    out = []
    off = 0
    for s in reversed(_SEG):
        while length - off >= s:
            out.append((off, s))
            off += s
    return out


@dataclasses.dataclass
class BlockPlan:
    chunks: list
    fallback: tuple  # (ga, gb, gd, gk)
    B_I: int
    B_J: int
    stats: dict

    @property
    def n_block_pairs(self) -> int:
        return int(self.stats["pairs_blk"])


def build_block_plan(
    ga,
    gb,
    gd,
    gk,
    blk_row,
    blk_col,
    keys,
    nbc: int,
    npool: int,
    *,
    B_I: int = 8,
    B_J: int = 4,
    chunk: int = 2048,
    gate: float | None = None,
) -> BlockPlan:
    """Build the dst-block schedule for one level's E2 pairs.

    Pairs whose (block, panel) entry economics lose to the pair kernel
    (few cross products per fetched slab) go to ``fallback``.
    """
    import os as _os

    assert B_I == _ACLS[-1] and B_J == _BCLS[-1], (
        "size classes are built for B_I=8, B_J=4"
    )
    ga = np.asarray(ga, np.int64)
    gb = np.asarray(gb, np.int64)
    gd = np.asarray(gd, np.int64)
    gk = np.asarray(gk, np.int64)
    n = ga.size
    stats = dict(pairs_blk=0, pairs_fb=n, entries=0, blocks=0, bytes=0.0,
                 exec_flops=0.0)
    if n == 0 or npool >= (1 << 24):
        return BlockPlan([], (ga, gb, gd, gk), B_I, B_J, stats)

    I = blk_row[gd]
    J = blk_col[gd]
    bi = I // B_I
    bj = J // B_J
    nbj = -(-nbc // B_J)
    blk = bi * nbj + bj
    order = np.lexsort((ga, gb, gk, blk))
    ga, gb, gd, gk, blk = (
        ga[order], gb[order], gd[order], gk[order], blk[order]
    )
    I, J, bi, bj = I[order], J[order], bi[order], bj[order]

    # entry = (block, K) group
    ent_key = blk * np.int64(nbc + 1) + gk
    ent_first = np.empty(n, bool)
    ent_first[0] = True
    ent_first[1:] = ent_key[1:] != ent_key[:-1]
    eid = np.cumsum(ent_first) - 1
    ne = int(eid[-1]) + 1
    e_start = np.flatnonzero(ent_first)
    e_end = np.append(e_start[1:], n)

    a0 = np.minimum.reduceat(ga, e_start)
    a1 = np.maximum.reduceat(ga, e_start)
    b0 = np.minimum.reduceat(gb, e_start)
    b1 = np.maximum.reduceat(gb, e_start)
    ha = a1 - a0 + 1
    hb = b1 - b0 + 1
    assert (ha <= B_I).all() and (hb <= B_J).all()
    ha_cls = np.searchsorted(_ACLS, np.minimum(ha, _ACLS[-1]))
    hb_cls = np.searchsorted(_BCLS, np.minimum(hb, _BCLS[-1]))
    ha_sz = np.asarray(_ACLS)[ha_cls]
    hb_sz = np.asarray(_BCLS)[hb_cls]
    # class slabs must stay inside the pool (junk reads ok, OOB not)
    a0e = np.minimum(a0, npool - ha_sz)
    b0e = np.minimum(b0, npool - hb_sz)
    e_blk = blk[e_start]
    e_gk = gk[e_start]
    e_pairs = e_end - e_start

    # per-entry economics: slab tiles fetched per pair vs the pair
    # kernel's ~2.2 tiles/pair; dst io amortizes across the block's
    # entries, approximated with the block's entry count
    blk_first_e = np.empty(ne, bool)
    blk_first_e[0] = True
    blk_first_e[1:] = e_blk[1:] != e_blk[:-1]
    bid_of_e = np.cumsum(blk_first_e) - 1
    nblocks = int(bid_of_e[-1]) + 1
    ent_of_blk = np.bincount(bid_of_e, minlength=nblocks)
    pairs_of_blk = np.zeros(nblocks, np.int64)
    np.add.at(pairs_of_blk, bid_of_e, e_pairs)
    # dst tiles touched per block (distinct gd)
    dst_of_blk = np.zeros(nblocks, np.int64)
    uniq_d = np.empty(n, bool)
    uniq_d[0] = True
    uniq_d[1:] = (gd[1:] != gd[:-1]) | (blk[1:] != blk[:-1])
    np.add.at(dst_of_blk, bid_of_e[eid], uniq_d)
    est_tiles_pp = (
        (ha_sz + hb_sz) / np.maximum(e_pairs, 1)
        + (2.0 * dst_of_blk / np.maximum(pairs_of_blk, 1))[bid_of_e]
    )
    if gate is None:
        gate = float(_os.environ.get("PASTIX_BLOCK_GATE", "1.8"))
    keep_e = est_tiles_pp <= gate  # pair kernel ~2.2 tiles/pair
    keep = keep_e[eid]
    fb = (ga[~keep], gb[~keep], gd[~keep], gk[~keep])
    if not keep.any():
        return BlockPlan([], fb, B_I, B_J, stats)

    # re-extract kept pairs/entries (entry boundaries survive: pairs of an
    # entry are kept or dropped together)
    sel_e = np.flatnonzero(keep_e)
    chunks = []
    tot_bytes = 0.0
    tot_entries = 0
    tot_blocks = 0
    tot_exec = 0.0
    T = None  # filled by caller via kernel; flops use T^3 at call site

    # chunk over entries, never splitting a block
    e_ptr = 0
    while e_ptr < sel_e.size:
        e_hi = min(e_ptr + chunk, sel_e.size)
        # extend/shrink to a block boundary
        if e_hi < sel_e.size:
            while (
                e_hi > e_ptr + 1
                and e_blk[sel_e[e_hi]] == e_blk[sel_e[e_hi - 1]]
            ):
                e_hi -= 1
        ce = sel_e[e_ptr:e_hi]
        e_ptr = e_hi

        m = ce.size
        flags = np.full(m, _E_VALID, np.int64)
        cblk = e_blk[ce]
        bfirst = np.empty(m, bool)
        bfirst[0] = True
        bfirst[1:] = cblk[1:] != cblk[:-1]
        blast = np.empty(m, bool)
        blast[-1] = True
        blast[:-1] = bfirst[1:]
        wid = np.cumsum(bfirst) - 1
        nw = int(wid[-1]) + 1
        bpar_w = np.arange(nw) % 2
        # at block m's first entry, the prefetch of block m+1's read goes
        # into slot 1-bpar(m), which block m-1's write still owns: wait it
        # iff m-1 exists AND the prefetch happens (m+1 < nw).  Every write
        # must be waited EXACTLY once (the end drain covers the last two);
        # the off-by-one here (2: instead of 1:) left block 0's write
        # un-waited and double-waited block nw-2 — an undrained/underflowed
        # DMA semaphore faults the chip (bisected on v5e, round 4)
        wwpref_w = np.zeros(nw, bool)
        if nw > 2:
            wwpref_w[1 : nw - 1] = True

        apar = np.arange(m) % 2

        # ---- dst io ops per block in this chunk -------------------------
        io_ops = []
        rd_packed = np.zeros(m, np.int32)
        nx_packed = np.full(m, -1, np.int32)
        wr_packed = np.zeros(m, np.int32)
        blk_io_range = []
        firsts = np.flatnonzero(bfirst)
        lasts = np.flatnonzero(blast)
        for w in range(nw):
            e0 = ce[firsts[w]]
            bb = e_blk[e0]
            w_bi, w_bj = bb // nbj, bb % nbj
            ops = []
            # columns with pairs in this block (from its entries' gd)
            lo_p, hi_p = e_start[e0], e_end[ce[lasts[w]]]
            cols = np.unique(J[lo_p:hi_p][blk[lo_p:hi_p] == bb])
            for Jc in cols:
                jj = int(Jc - w_bj * B_J)
                lo = int(np.searchsorted(keys, Jc * nbc + w_bi * B_I))
                hi = int(
                    np.searchsorted(keys, Jc * nbc + (w_bi + 1) * B_I)
                )
                for off, s in _seg_cover(hi - lo):
                    sc = _SEG.index(s)
                    # start(24b) | off(3b) | sc(2b) | jj(2b) = 31 bits
                    ops.append(
                        np.int32(
                            (lo + off)
                            + (off << 24)
                            + (sc << 27)
                            + (jj << 29)
                        )
                    )
            assert len(ops) <= _MAXIO, "dst io segments exceed _MAXIO"
            blk_io_range.append((len(io_ops), len(ops)))
            io_ops.extend(ops)
        for w in range(nw):
            p, c = blk_io_range[w]
            rd_packed[firsts[w]] = _pack_ptr(p, c)
            wr_packed[lasts[w]] = _pack_ptr(p, c)
            if w + 1 < nw:
                p2, c2 = blk_io_range[w + 1]
                nx_packed[firsts[w]] = _pack_ptr(p2, c2)

        # ---- scatter ops per entry --------------------------------------
        sc_ops = []
        sc_packed = np.zeros(m, np.int32)
        for t, e in enumerate(ce):
            lo_p, hi_p = e_start[e], e_end[e]
            bb = e_blk[e]
            w_bi, w_bj = bb // nbj, bb % nbj
            ar = (ga[lo_p:hi_p] - a0[e]).astype(np.int64)
            jb = (gb[lo_p:hi_p] - b0[e]).astype(np.int64)
            Jp = J[lo_p:hi_p]
            jjp = Jp - w_bj * B_J
            col_lo = np.searchsorted(keys, Jp * nbc + w_bi * B_I)
            slot = gd[lo_p:hi_p] - col_lo
            ops = []
            # group by jb, emit runs contiguous in BOTH ar and slot
            o2 = np.lexsort((ar, jb))
            ars, jbs, jjs, slots = ar[o2], jb[o2], jjp[o2], slot[o2]
            k0 = 0
            for t2 in range(1, ars.size + 1):
                if (
                    t2 == ars.size
                    or jbs[t2] != jbs[k0]
                    or ars[t2] != ars[t2 - 1] + 1
                    or slots[t2] != slots[t2 - 1] + 1
                ):
                    run_len = t2 - k0
                    for off, s in _seg_cover(run_len):
                        sc = _SEG.index(s)
                        ops.append(
                            np.int32(
                                int(ars[k0] + off)
                                + (int(slots[k0] + off) << 4)
                                + (int(jbs[k0]) << 8)
                                + (int(jjs[k0]) << 11)
                                + (sc << 14)
                            )
                        )
                    k0 = t2
            sc_packed[t] = _pack_ptr(len(sc_ops), len(ops))
            sc_ops.extend(ops)

        flags += (
            bfirst * _E_BFIRST
            + blast * _E_BLAST
            + (wwpref_w[wid] & bfirst) * _E_WWPREF
            + bpar_w[wid] * _E_BPAR
            + apar * _E_APAR
            + (ha_cls[ce] << _SH_HA)
            + (hb_cls[ce] << _SH_HB)
        )
        # end drain: outstanding writes (last two blocks)
        endw = np.full(2, -1, np.int32)
        p_last = int(bpar_w[-1])
        pp, cc = blk_io_range[-1]
        endw[p_last] = _pack_ptr(pp, cc)
        if nw >= 2:
            pp, cc = blk_io_range[-2]
            endw[1 - p_last] = _pack_ptr(pp, cc)

        t = {
            "flags": flags.astype(np.int32),
            "a0": a0e[ce].astype(np.int32),
            "b0": b0e[ce].astype(np.int32),
            "sc": sc_packed,
            "rd": rd_packed,
            "nx": nx_packed,
            "wr": wr_packed,
            "endw": endw,
            "io_ops": np.asarray(io_ops, np.int32)
            if io_ops
            else np.zeros(1, np.int32),
            "sc_ops": np.asarray(sc_ops, np.int32)
            if sc_ops
            else np.zeros(1, np.int32),
            "gk": e_gk[ce].astype(np.int32),
        }
        chunks.append(t)
        tot_entries += m
        tot_blocks += nw
        io_tiles = sum(
            _SEG[(int(op) >> 27) & 3] for op in t["io_ops"]
        )
        tot_bytes += float(
            (ha_sz[ce] + hb_sz[ce]).sum() + 2 * io_tiles
        )
        tot_exec += float((ha_sz[ce] * hb_sz[ce]).sum())

    stats.update(
        pairs_blk=int(keep.sum()),
        pairs_fb=int(fb[0].size),
        entries=tot_entries,
        blocks=tot_blocks,
        exec_tile_products=tot_exec,
        tiles_moved=tot_bytes,
    )
    return BlockPlan(chunks, fb, B_I, B_J, stats)


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------


def _mk_block_kernel(ne, B_I, B_J, scaled, update_dtype, out_dtype, T):
    cdt = update_dtype or out_dtype
    import os as _os

    _dbg = set(_os.environ.get("PASTIX_BLOCK_DBG", "").split(","))

    def kernel(*args):
        if scaled:
            (flags, a0, b0, sc, rd, nx, wr, endw, io_ops, sc_ops,
             gk) = args[:11]
            refs = args[11:]
        else:
            (flags, a0, b0, sc, rd, nx, wr, endw, io_ops,
             sc_ops) = args[:10]
            refs = args[10:]
        refs = refs[1:]  # drop aliased input pool ref
        if scaled:
            d_ref = refs[0]
            refs = refs[1:]
        out, a_buf, b_buf, blkbuf, cbuf, asem, bsem, rsem, wsem = refs
        e = pl.program_id(0)
        f = flags[e]
        bpar = (f // _E_BPAR) % 2
        apar = (f // _E_APAR) % 2
        ha_i = (f // (1 << _SH_HA)) % 4
        hb_i = (f // (1 << _SH_HB)) % 2

        # --- dst block io helpers (exact size-class segments) ----------
        # statically unrolled over _MAXIO ops with per-op semaphores: a
        # dynamic-trip fori_loop issuing DMAs faulted the v5e (bisected
        # round 4); the op count is small (<= B_J columns x 3 segments)
        def io_each(packed, fn):
            ptr = packed % (1 << 24)
            cnt = packed // (1 << 24)
            for q in range(_MAXIO):
                @pl.when(q < cnt)
                def _(q=q):
                    op = io_ops[ptr + q]
                    start = op % (1 << 24)
                    off = (op // (1 << 24)) % 8
                    if "off0" in _dbg:  # bisect: dynamic dst-slice start
                        off = off * 0
                    scls = (op // (1 << 27)) % 4
                    jj = (op // (1 << 29)) % 4
                    jax.lax.switch(
                        scls,
                        [lambda s=s: fn(start, off, jj, q, s) for s in _SEG],
                    )

        # blkbuf is flat (2*B_J*B_I, T, T): every DMA slice is a
        # leading-dim pl.ds — the only slice form the v5e accepted
        # (dynamic starts on inner dims of 4-D refs faulted; bisected)
        def _bslice(slot, jj, off, s):
            return blkbuf.at[pl.ds((slot * B_J + jj) * B_I + off, s)]

        def rd_seg(slot):
            def fn(start, off, jj, q, s):
                pltpu.make_async_copy(
                    out.at[pl.ds(start, s)],
                    _bslice(slot, jj, off, s),
                    rsem.at[slot, q],
                ).start()

            return fn

        def rd_seg_wait(slot):
            def fn(start, off, jj, q, s):
                pltpu.make_async_copy(
                    out.at[pl.ds(start, s)],
                    _bslice(slot, jj, off, s),
                    rsem.at[slot, q],
                ).wait()

            return fn

        def wr_seg(slot):
            def fn(start, off, jj, q, s):
                pltpu.make_async_copy(
                    _bslice(slot, jj, off, s),
                    out.at[pl.ds(start, s)],
                    wsem.at[slot, q],
                ).start()

            return fn

        def wr_seg_wait(slot):
            def fn(start, off, jj, q, s):
                pltpu.make_async_copy(
                    _bslice(slot, jj, off, s),
                    out.at[pl.ds(start, s)],
                    wsem.at[slot, q],
                ).wait()

            return fn

        # --- slab DMAs (class-sized) ------------------------------------
        def a_cp(idx, cls_i, slot, do_wait=False):
            def one(s):
                cp = pltpu.make_async_copy(
                    out.at[pl.ds(idx, s)],
                    a_buf.at[slot, pl.ds(0, s)],
                    asem.at[slot],
                )
                cp.wait() if do_wait else cp.start()

            jax.lax.switch(cls_i, [lambda s=s: one(s) for s in _ACLS])

        def b_cp(idx, cls_i, slot, do_wait=False):
            def one(s):
                cp = pltpu.make_async_copy(
                    out.at[pl.ds(idx, s)],
                    b_buf.at[slot, pl.ds(0, s)],
                    bsem.at[slot],
                )
                cp.wait() if do_wait else cp.start()

            jax.lax.switch(cls_i, [lambda s=s: one(s) for s in _BCLS])

        @pl.when(e == 0)
        def _():
            a_cp(a0[0], ha_i, apar)
            b_cp(b0[0], hb_i, apar)
            if "noio" not in _dbg:
                io_each(rd[0], rd_seg(bpar))

        @pl.when((f // _E_BFIRST) % 2 == 1)
        def _():
            if "noio" not in _dbg:
                @pl.when((f // _E_WWPREF) % 2 == 1)
                def _():
                    io_each(wr[e - 1], wr_seg_wait(1 - bpar))

                io_each(rd[e], rd_seg_wait(bpar))

                @pl.when(nx[e] >= 0)
                def _():
                    io_each(nx[e], rd_seg(1 - bpar))

        # wait own slabs, prefetch next entry's
        a_cp(a0[e], ha_i, apar, do_wait=True)
        b_cp(b0[e], hb_i, apar, do_wait=True)

        @pl.when(e + 1 < ne)
        def _():
            f1 = flags[e + 1]
            a_cp(a0[e + 1], (f1 // (1 << _SH_HA)) % 4, 1 - apar)
            b_cp(b0[e + 1], (f1 // (1 << _SH_HB)) % 2, 1 - apar)

        # --- the big cross-product dot + VMEM scatter -------------------
        if scaled:
            a_buf[apar] = a_buf[apar] * d_ref[gk[e]][None, None, :]

        def compute(ha_s, hb_s):
            # per-b-column dots into a VMEM scratch (Mosaic has no
            # dynamic_slice on values; ref slicing with pl.ds is fine):
            # cbuf[jb] = a_slab @ b_tile_jb^T, shapes (ha_s*T, T)
            a = a_buf[apar, pl.ds(0, ha_s)].reshape(ha_s * T, T)
            dn = (((1,), (1,)), ((), ()))
            for jb_s in range(hb_s):
                b = b_buf[apar, jb_s]
                if update_dtype is not None:
                    contrib = jax.lax.dot_general(
                        a.astype(cdt), b.astype(cdt), dn,
                        preferred_element_type=jnp.float32,
                    )
                else:
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
                        jax.lax.dot_general(a_hi, b_hi, dn,
                                            preferred_element_type=f32)
                        + jax.lax.dot_general(a_hi, b_lo, dn,
                                              preferred_element_type=f32)
                        + jax.lax.dot_general(a_lo, b_hi, dn,
                                              preferred_element_type=f32)
                    )
                cbuf[jb_s, pl.ds(0, ha_s * T), :] = contrib.astype(
                    out_dtype
                )

            ptr = sc[e] % (1 << 24)
            cnt = sc[e] // (1 << 24)

            def body(q, _):
                op = sc_ops[ptr + q]
                ar0 = op % 16
                slot0 = (op // 16) % 16
                jb = (op // (1 << 8)) % 8
                jj = (op // (1 << 11)) % 8
                scls = (op // (1 << 14)) % 4

                def sub(s):
                    # classes larger than this branch's contrib height are
                    # unreachable at runtime (run_len <= ha <= ha_s)
                    s = min(s, ha_s)
                    piece = cbuf[jb, pl.ds(ar0 * T, s * T), :]
                    base = (bpar * B_J + jj) * B_I + slot0
                    blkbuf[pl.ds(base, s), :, :] = (
                        blkbuf[pl.ds(base, s), :, :]
                        - piece.reshape(s, T, T)
                    )

                jax.lax.switch(scls, [lambda s=s: sub(s) for s in _SEG])
                return 0

            if "noscatter" not in _dbg:
                jax.lax.fori_loop(0, cnt, body, 0)

        idx6 = ha_i * 2 + hb_i
        if "nodot" in _dbg:
            idx6 = idx6 * 0
        jax.lax.switch(
            idx6,
            [
                lambda A=A, B=B: compute(A, B)
                for A in _ACLS
                for B in _BCLS
            ],
        )

        if "noio" not in _dbg:
            @pl.when((f // _E_BLAST) % 2 == 1)
            def _():
                io_each(wr[e], wr_seg(bpar))

            @pl.when(e == ne - 1)
            def _():
                for p in range(2):
                    @pl.when(endw[p] >= 0)
                    def _(p=p):
                        io_each(endw[p], wr_seg_wait(p))

    return kernel


def gemm_scatter_block(
    pool,
    plan: BlockPlan,
    d=None,
    update_dtype=None,
    interpret=None,
):
    """Apply the dst-block E2 schedule; returns the updated (donated) pool.

    The plan's ``fallback`` pairs must be run separately (pair kernel)."""
    if interpret is None:
        interpret = _INTERPRET
    scaled = d is not None
    out_dtype = pool.dtype
    T = pool.shape[1]
    B_I, B_J = plan.B_I, plan.B_J
    for t in plan.chunks:
        ne = int(t["flags"].shape[0])
        if ne == 0:
            continue
        kernel = _mk_block_kernel(
            ne, B_I, B_J, scaled, update_dtype, out_dtype, T
        )
        scalars = [
            jnp.asarray(t["flags"]), jnp.asarray(t["a0"]),
            jnp.asarray(t["b0"]), jnp.asarray(t["sc"]),
            jnp.asarray(t["rd"]), jnp.asarray(t["nx"]),
            jnp.asarray(t["wr"]), jnp.asarray(t["endw"]),
            jnp.asarray(t["io_ops"]), jnp.asarray(t["sc_ops"]),
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
            grid=(ne,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.VMEM((2, B_I, T, T), out_dtype),   # a slabs
                pltpu.VMEM((2, B_J, T, T), out_dtype),   # b slabs
                pltpu.VMEM((2 * B_J * B_I, T, T), out_dtype),  # dst blocks
                pltpu.VMEM((B_J, B_I * T, T), out_dtype),  # contrib scratch
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2, _MAXIO)),
                pltpu.SemaphoreType.DMA((2, _MAXIO)),
            ],
        )
        pool = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(pool.shape, out_dtype),
            input_output_aliases={nsc: 0},
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            cost_estimate=pl.CostEstimate(
                flops=2 * ne * B_I * B_J * T * T * T,
                bytes_accessed=ne * (B_I + B_J) * T * T
                * out_dtype.itemsize,
                transcendentals=0,
            ),
            interpret=interpret,
        )(*scalars, *operands)
    return pool
