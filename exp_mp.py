"""Microbench (TPU): MULTI-PAIR segment dots from the VMEM operand cache.

round-4 exp_cache validated the chunk-resident cache (one big DMA per
chunk, zero per-pair operand DMAs) but hit the ~1.1 us/pair FIXED cost:
dst segment bookkeeping + flag decode + per-pair MXU issue + per-pair
64KB acc read-modify-write.  This prototype groups G pairs OF THE SAME
DST SEGMENT into one grid step:

  * segments are padded to a multiple of G with null pairs that read a
    zeroed cache slot (contribution = 0) — no per-pair predication;
  * flags/rd/dst tables are per STEP, so flag decode + acc RMW happen
    once per G pairs;
  * the G dots either accumulate in registers ("loop") or fuse into ONE
    dot_general with two contraction dims ("dot2": (G,T,T)x(G,T,T)
    contracting (0,2) — a (T, G*T)x(G*T, T) MXU pass).

Run on TPU: python exp_mp.py [nx] [rank] [K_IT] [CHUNK] [G]
"""
import sys, time
import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

cache = "/root/.cache/pastix_jax"
try:
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

nx = int(sys.argv[1]) if len(sys.argv) > 1 else 64
rank = int(sys.argv[2]) if len(sys.argv) > 2 else 0
K_IT = int(sys.argv[3]) if len(sys.argv) > 3 else 10
CHUNK = int(sys.argv[4]) if len(sys.argv) > 4 else 1536
G_LIST = [int(g) for g in (sys.argv[5].split(",") if len(sys.argv) > 5
                           else ["4", "8"])]

from pastix_tpu.generators import poisson_3d
from pastix_tpu.pastix import Pastix
from pastix_tpu.config import PastixConfig
from pastix_tpu.numeric.pallas_kernels import (
    build_pipeline_schedule, gemm_scatter_pipelined,
    _F_FIRST, _F_PAR, _F_LAST, _F_WRWAIT)

A = poisson_3d(nx)
s = Pastix(A, PastixConfig(tile_size=128))
s.order(); s.symbfact(); s.analyze()
lay = s.layout
lvs = sorted(lay.levels, key=lambda lv: -lv.gemm_a.size)
lv = lvs[rank]
ng = lv.gemm_a.size
T = lay.T
tp = np.asarray(lv.trsm_panel)
print(f"n={A.n} rank={rank} pairs={ng} panel_tiles={tp.size}", flush=True)

rng = np.random.default_rng(0)
pool = jnp.asarray(
    rng.standard_normal((lay.npool, T, T)).astype(np.float32) * 1e-3
)
xab = jnp.asarray(
    np.asarray(pool[jnp.asarray(tp)]).astype(np.float32)
).astype(jnp.bfloat16)

# segment-length stats: what does padding-to-G cost?
order = np.argsort(lv.gemm_d, kind="stable")
gd_s = lv.gemm_d[order]
seg_id = np.cumsum(np.concatenate([[1], gd_s[1:] != gd_s[:-1]])) - 1
seg_len = np.bincount(seg_id)
print(f"segments={seg_len.size} len: mean={seg_len.mean():.1f} "
      f"med={int(np.median(seg_len))} max={seg_len.max()}", flush=True)
for G in [2, 4, 8, 16]:
    padded = (np.ceil(seg_len / G) * G).sum()
    print(f"  G={G:>2}: padded pairs {int(padded)} (x{padded/ng:.2f}), "
          f"steps {int(padded)//G} ({ng/(int(padded)//G):.1f} real "
          f"pairs/step)", flush=True)


def build_mp_schedule(ga, gb, gd, chunk, G, ext_tiles):
    """Dst-sorted, segment-padded-to-G schedule with per-STEP tables."""
    order = np.argsort(gd, kind="stable")
    ga = np.asarray(ga, np.int64)[order]
    gb = np.asarray(gb, np.int64)[order]
    gd = np.asarray(gd, np.int64)[order]
    ext = np.asarray(ext_tiles)
    ga_c = np.searchsorted(ext, ga).astype(np.int64)
    gb_c = np.searchsorted(ext, gb).astype(np.int64)
    assert (ext[ga_c] == ga).all() and (ext[gb_c] == gb).all()
    # pad each segment to a multiple of G (null pairs: compact idx -1)
    first = np.concatenate([[1], (gd[1:] != gd[:-1]).astype(np.int64)])
    seg = np.cumsum(first) - 1
    slen = np.bincount(seg)
    plen = (np.ceil(slen / G) * G).astype(np.int64)
    nsteps_total = int(plen.sum()) // G
    # emit padded pair arrays
    np2_ = int(plen.sum())
    pga = np.full(np2_, -1, np.int64)
    pgb = np.full(np2_, -1, np.int64)
    sdst = gd[np.concatenate([[0], np.flatnonzero(first[1:]) + 1])]
    step_dst = np.repeat(sdst, plen // G)      # per-step dst
    step_seg = np.repeat(np.arange(slen.size), plen // G)
    starts = np.concatenate([[0], np.cumsum(plen)[:-1]])
    src_pos = starts[seg] + np.arange(ga.size) - np.concatenate(
        [[0], np.cumsum(slen)[:-1]])[seg]
    pga[src_pos] = ga_c
    pgb[src_pos] = gb_c
    # chunk at step granularity
    ch_steps = max(1, chunk // G)
    out = []
    for lo in range(0, nsteps_total, ch_steps):
        hi = min(lo + ch_steps, nsteps_total)
        ns = hi - lo
        cga = pga[lo * G: hi * G]
        cgb = pgb[lo * G: hi * G]
        cdst = step_dst[lo:hi]
        cseg = step_seg[lo:hi]
        # per-chunk unique cache (real pairs only) + zero slot for nulls
        real = cga >= 0
        u = np.unique(np.concatenate([cga[real], cgb[real]]))
        CT = u.size + 1  # +1 zero slot
        ga_v = np.full(cga.size, u.size, np.int32)
        gb_v = np.full(cgb.size, u.size, np.int32)
        ga_v[real] = np.searchsorted(u, cga[real])
        gb_v[cgb >= 0] = np.searchsorted(u, cgb[cgb >= 0])
        # per-step flags
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
        out.append({
            "ga_v": ga_v, "gb_v": gb_v, "gd": cdst.astype(np.int32),
            "flags": flags, "rd": rd, "endw": endw, "endt": endt,
            "cu": u.astype(np.int32), "CT": CT, "G": G, "nsteps": ns,
        })
    return out


def mk_mp_kernel(nsteps, G, CT, out_dtype, variant):
    def kernel(ga, gb, gd, flags, rd, endw, endt, *refs):
        refs = refs[1:]  # aliased input pool
        Xc, out, cache_buf, acc, csem, rsem, wsem = refs
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            pltpu.make_async_copy(Xc, cache_buf, csem).start()
            pltpu.make_async_copy(
                out.at[gd[0]], acc.at[0], rsem.at[0]
            ).start()
            pltpu.make_async_copy(Xc, cache_buf, csem).wait()

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

        if variant == "dot2":
            a = jnp.stack([cache_buf[ga[i * G + u]] for u in range(G)])
            b = jnp.stack([cache_buf[gb[i * G + u]] for u in range(G)])
            dn = (((0, 2), (0, 2)), ((), ()))
            contrib = jax.lax.dot_general(
                a, b, dn, preferred_element_type=jnp.float32)
        else:  # register-accumulated per-pair dots
            dn = (((1,), (1,)), ((), ()))
            contrib = jax.lax.dot_general(
                cache_buf[ga[i * G]], cache_buf[gb[i * G]], dn,
                preferred_element_type=jnp.float32)
            for u in range(1, G):
                contrib = contrib + jax.lax.dot_general(
                    cache_buf[ga[i * G + u]], cache_buf[gb[i * G + u]],
                    dn, preferred_element_type=jnp.float32)
        acc[par] = acc[par] - contrib.astype(out_dtype)

        @pl.when((f // _F_LAST) % 2 == 1)
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


def gemm_scatter_mp(pool, xab, sched, variant):
    out_dtype = pool.dtype
    for t in sched:
        ns = t["nsteps"]
        if ns == 0:
            continue
        G, CT = t["G"], t["CT"]
        CTp = -(-CT // 8) * 8
        Xc = jnp.zeros((CTp, T, T), jnp.bfloat16).at[
            : t["cu"].size
        ].set(xab[jnp.asarray(t["cu"])])
        scalars = [
            jnp.asarray(t["ga_v"]), jnp.asarray(t["gb_v"]),
            jnp.asarray(t["gd"]), jnp.asarray(t["flags"]),
            jnp.asarray(t["rd"]), jnp.asarray(t["endw"]),
            jnp.asarray(t["endt"]),
        ]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=7,
            grid=(ns,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.VMEM((CTp, T, T), jnp.bfloat16),
                pltpu.VMEM((2, T, T), out_dtype),
                pltpu.SemaphoreType.DMA(()),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
        pool = pl.pallas_call(
            mk_mp_kernel(ns, G, CTp, out_dtype, variant),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(pool.shape, out_dtype),
            input_output_aliases={7: 0},
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            cost_estimate=pl.CostEstimate(
                flops=2 * ns * G * T * T * T,
                bytes_accessed=ns * G * T * T * 4,
                transcendentals=0,
            ),
        )(*scalars, pool, Xc)
    return pool


def sync(x):
    jax.block_until_ready(x)
    return float(np.asarray(x[-1])[-1, -1])


def timeit(name, op, reps=3):
    flops = 2.0 * ng * T**3

    @jax.jit
    def many(p):
        return lax.fori_loop(0, K_IT, lambda i, q: op(q), p)
    t0 = time.perf_counter()
    out = many(pool); sync(out)
    tc = time.perf_counter() - t0
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = many(pool); sync(out)
        ts.append(time.perf_counter() - t0)
    t = min(ts) / K_IT
    print(f"{name:34s}: {t*1e3:8.2f} ms  {flops/t/1e12:6.2f} TF/s "
          f"{t/ng*1e9:6.0f} ns/pair [compile {tc:.0f}s]", flush=True)
    return out


# correctness first
from pastix_tpu.numeric import kernels as K
ref = K.gemm_scatter(pool, lv.gemm_a, lv.gemm_b, lv.gemm_d,
                     update_dtype=jnp.bfloat16)
for G in G_LIST:
    sched = build_mp_schedule(lv.gemm_a, lv.gemm_b, lv.gemm_d,
                              CHUNK, G, tp)
    mx = max(t["CT"] for t in sched)
    print(f"G={G}: chunks={len(sched)} max CT={mx} "
          f"(cache {(-(-mx // 8) * 8)*T*T*2/2**20:.1f} MiB)", flush=True)
    for variant in ("loop", "dot2"):
        got = gemm_scatter_mp(pool, xab, sched, variant)
        err = float(jnp.max(jnp.abs(got - ref)))
        rel = err / float(jnp.max(jnp.abs(ref)))
        tag = "OK " if rel < 1e-6 else "BAD"
        print(f"  mp/{variant} G={G} max err: {err:.2e} (rel {rel:.2e}) "
              f"{tag}", flush=True)
        timeit(f"mp/{variant} G={G}",
               lambda p, sched=sched, variant=variant:
               gemm_scatter_mp(p, xab, sched, variant))

# baseline: the current production stream kernel
sched_s = build_pipeline_schedule(
    lv.gemm_a, lv.gemm_b, lv.gemm_d, chunk=CHUNK * 4, group=2,
    ext_tiles=tp)
timeit("stream pair kernel (prod default)",
       lambda p: gemm_scatter_pipelined(
           p, sched_s, update_dtype=jnp.bfloat16, xab=xab))
