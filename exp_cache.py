"""Microbench (TPU): chunk-resident VMEM operand cache for the E2 kernel.

exp_dma (round 4) pinned the pair kernel's floor at ~0.12 us per DMA
TRANSACTION regardless of size: 2 operand DMAs per pair can never go
below ~0.25 us/pair.  This prototype removes per-pair operand DMAs
entirely: per dst-sorted chunk, XLA gathers the chunk's UNIQUE bf16
operand tiles into a compact array, the kernel loads it into VMEM with
ONE big DMA, and every pair reads its operands from VMEM by index.  The
dst side keeps the proven segment accumulators.

Run on TPU: python exp_cache.py [nx] [rank] [K_IT]
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

from pastix_tpu.generators import poisson_3d
from pastix_tpu.pastix import Pastix
from pastix_tpu.config import PastixConfig
from pastix_tpu.numeric.pallas_kernels import (
    build_pipeline_schedule, gemm_scatter_pipelined,
    _F_PAR, _F_VALID, _F_LAST, _F_WRWAIT)

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
# the bf16 panel stream (as the production TRSM emits it)
xab = jnp.asarray(
    np.asarray(pool[jnp.asarray(tp)]).astype(np.float32)
).astype(jnp.bfloat16)

CHUNK = int(sys.argv[4]) if len(sys.argv) > 4 else 1536
GRP = int(sys.argv[5]) if len(sys.argv) > 5 else 2
sched = build_pipeline_schedule(
    lv.gemm_a, lv.gemm_b, lv.gemm_d, chunk=CHUNK, group=GRP,
    ext_tiles=tp,
)
# per-chunk uniq compact ids + cache size
CT = 0
for t in sched:
    u = np.unique(np.concatenate([t["ga_c"], t["gb_c"]]))
    t["cu"] = u.astype(np.int32)
    t["ga_v"] = np.searchsorted(u, t["ga_c"]).astype(np.int32)
    t["gb_v"] = np.searchsorted(u, t["gb_c"]).astype(np.int32)
    CT = max(CT, u.size)
CT = -(-CT // 8) * 8
print(f"chunks={len(sched)} max uniq tiles/chunk={CT} "
      f"(VMEM cache {CT*T*T*2/2**20:.1f} MiB)", flush=True)


def mk_kernel(ngp, G, CT, out_dtype):
    def kernel(ga, gb, gd, flags, rd, endw, endt, *refs):
        refs = refs[1:]  # aliased input pool
        Xc, out, cache_buf, acc, csem, rsem, wsem = refs
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            # ONE big DMA: the chunk's whole compact operand array
            pltpu.make_async_copy(Xc, cache_buf, csem).start()
            pltpu.make_async_copy(
                out.at[gd[0]], acc.at[0], rsem.at[0]
            ).start()
            pltpu.make_async_copy(Xc, cache_buf, csem).wait()

        for u in range(G):
            j = i * G + u
            f = flags[j]
            par = (f // _F_PAR) % 2

            @pl.when(f % 2 == 1)  # first step of a dst segment
            def _(j=j, f=f, par=par):
                pltpu.make_async_copy(
                    out.at[gd[j]], acc.at[par], rsem.at[par]
                ).wait()

                @pl.when(rd[j] >= 0)
                def _():
                    q = 1 - par

                    @pl.when((f // _F_WRWAIT) % 2 == 1)
                    def _():
                        pltpu.make_async_copy(
                            acc.at[q], out.at[gd[j - 1]], wsem.at[q]
                        ).wait()

                    pltpu.make_async_copy(
                        out.at[rd[j]], acc.at[q], rsem.at[q]
                    ).start()

            @pl.when((f // _F_VALID) % 2 == 1)
            def _(j=j, par=par):
                a = cache_buf[ga[j]]
                b = cache_buf[gb[j]]
                dn = (((1,), (1,)), ((), ()))
                contrib = jax.lax.dot_general(
                    a, b, dn, preferred_element_type=jnp.float32,
                )
                acc[par] = acc[par] - contrib.astype(out_dtype)

            @pl.when((f // _F_LAST) % 2 == 1)
            def _(j=j, par=par):
                pltpu.make_async_copy(
                    acc.at[par], out.at[gd[j]], wsem.at[par]
                ).start()

        @pl.when(i == ngp - 1)
        def _():
            for p in range(2):
                @pl.when(endw[p] == 1)
                def _(p=p):
                    pltpu.make_async_copy(
                        acc.at[p], out.at[endt[p]], wsem.at[p]
                    ).wait()

    return kernel


def gemm_scatter_vcache(pool, xab, sched):
    out_dtype = pool.dtype
    for t in sched:
        n = int(t["ga_v"].shape[0])
        if n == 0:
            continue
        G = int(t["group"])
        # compact per-chunk operand array, padded to the cache size
        cu = jnp.asarray(t["cu"])
        Xc = jnp.zeros((CT, T, T), jnp.bfloat16).at[
            : t["cu"].size
        ].set(xab[cu])
        scalars = [
            jnp.asarray(t["ga_v"]), jnp.asarray(t["gb_v"]),
            jnp.asarray(t["gd"]), jnp.asarray(t["flags"]),
            jnp.asarray(t["rd"]), jnp.asarray(t["endw"]),
            jnp.asarray(t["endt"]),
        ]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=7,
            grid=(n // G,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.VMEM((CT, T, T), jnp.bfloat16),
                pltpu.VMEM((2, T, T), out_dtype),
                pltpu.SemaphoreType.DMA(()),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
        pool = pl.pallas_call(
            mk_kernel(n // G, G, CT, out_dtype),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(pool.shape, out_dtype),
            input_output_aliases={7: 0},
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            cost_estimate=pl.CostEstimate(
                flops=2 * n * T * T * T,
                bytes_accessed=n * T * T * 4,
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
got = gemm_scatter_vcache(pool, xab, sched)
err = float(jnp.max(jnp.abs(got - ref)))
rel = err / float(jnp.max(jnp.abs(ref)))
print(f"vcache max err vs XLA: {err:.2e} (rel {rel:.2e})", flush=True)

sched_base = build_pipeline_schedule(lv.gemm_a, lv.gemm_b, lv.gemm_d,
                                     group=2)
timeit("pipelined r3 G=2 bf16 (pool ops)",
       lambda p: gemm_scatter_pipelined(p, sched_base,
                                        update_dtype=jnp.bfloat16))
timeit("stream compact (current default)",
       lambda p: gemm_scatter_pipelined(
           p, sched, update_dtype=jnp.bfloat16, xab=xab))
timeit("vcache (chunk-resident operands)",
       lambda p: gemm_scatter_vcache(p, xab, sched))
