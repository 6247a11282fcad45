"""Microbench (TPU): dst-block E2 kernel vs pipelined pair kernel on REAL
level tables (several level ranks: leaf, mid, upper).

Run on TPU: python exp_blockk.py [nx] [K_IT]
"""
import sys, time
import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

cache = "/root/.cache/pastix_jax"
try:
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

nx = int(sys.argv[1]) if len(sys.argv) > 1 else 64
K_IT = int(sys.argv[2]) if len(sys.argv) > 2 else 10

from pastix_tpu.generators import poisson_3d
from pastix_tpu.pastix import Pastix
from pastix_tpu.config import PastixConfig
from pastix_tpu.numeric.pallas_kernels import (
    build_pipeline_schedule, gemm_scatter_pipelined)
from pastix_tpu.numeric.block_kernels import (
    build_block_plan, gemm_scatter_block)

A = poisson_3d(nx)
s = Pastix(A, PastixConfig(tile_size=128))
s.order(); s.symbfact(); s.analyze()
lay = s.layout
lvs = sorted(lay.levels, key=lambda lv: -lv.gemm_a.size)
T = lay.T

rng = np.random.default_rng(0)
pool = jnp.asarray(
    rng.standard_normal((lay.npool, T, T)).astype(np.float32) * 1e-3
)


def sync(x):
    jax.block_until_ready(x)
    return float(np.asarray(x[-1])[-1, -1])


def timeit(name, op, ng, extra="", reps=3):
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
    print(f"{name:36s}: {t*1e3:8.2f} ms  {flops/t/1e12:6.2f} TF/s(pairs) "
          f"{t/ng*1e9:6.0f} ns/pair {extra} [compile {tc:.0f}s]", flush=True)


for rank in (0, 10, 20):
    if rank >= len(lvs):
        continue
    lv = lvs[rank]
    ng = lv.gemm_a.size
    if ng == 0:
        continue
    print(f"=== level rank {rank}: pairs={ng} cols={lv.cols.size} ===",
          flush=True)
    sched = build_pipeline_schedule(lv.gemm_a, lv.gemm_b, lv.gemm_d, group=2)
    timeit("pipelined r3 G=2 bf16",
           lambda p, s2=sched: gemm_scatter_pipelined(
               p, s2, update_dtype=jnp.bfloat16), ng)
    for gate in (1.8, 100.0):
        plan = build_block_plan(
            lv.gemm_a, lv.gemm_b, lv.gemm_d, lv.gemm_k,
            lay.blk_row, lay.blk_col, lay.keys, lay.nbc, lay.npool,
            gate=gate,
        )
        st = plan.stats
        if plan.n_block_pairs == 0:
            print(f"block gate={gate}: all pairs gated to fallback")
            continue
        fga, fgb, fgd, _ = plan.fallback
        fb_sched = (
            build_pipeline_schedule(
                fga.astype(np.int32), fgb.astype(np.int32),
                fgd.astype(np.int32), group=2,
            ) if fga.size else None
        )

        def op(p, plan=plan, fb=fb_sched):
            p = gemm_scatter_block(p, plan, update_dtype=jnp.bfloat16)
            if fb is not None:
                p = gemm_scatter_pipelined(p, fb, update_dtype=jnp.bfloat16)
            return p

        timeit(
            f"block gate={gate} bf16", op, ng,
            extra=(f"blk%={100*st['pairs_blk']/ng:.0f} "
                   f"ent={st['entries']} t/p="
                   f"{st['tiles_moved']/max(st['pairs_blk'],1):.2f}"),
        )
