"""Microbench: E2 update-kernel rate — XLA gather-GEMM-scatter vs the
round-2 fused kernel vs the round-3 pipelined kernel.

The op is iterated K times INSIDE one jitted program (the tunnel's
device->host sync costs ~50 ms, which would swamp a per-call timing).
Run on TPU: python exp_pipe.py [ng] [npool] [T] [seg] [K]
"""
import sys, time
import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

ng = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
npool = int(sys.argv[2]) if len(sys.argv) > 2 else 12000
T = int(sys.argv[3]) if len(sys.argv) > 3 else 128
seg = int(sys.argv[4]) if len(sys.argv) > 4 else 3
K_IT = int(sys.argv[5]) if len(sys.argv) > 5 else 20

cache = "/root/.cache/pastix_jax"
try:
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

from pastix_tpu.numeric import kernels as K
from pastix_tpu.numeric.pallas_kernels import (
    gemm_scatter_fused, sort_triples, build_pipeline_schedule,
    gemm_scatter_pipelined)

rng = np.random.default_rng(0)
nsrc = npool // 2
ga = rng.integers(0, nsrc, ng).astype(np.int32)
gb = rng.integers(0, nsrc, ng).astype(np.int32)
ndst = max(1, ng // seg)
gd = (nsrc + rng.integers(0, min(ndst, npool - nsrc), ng)).astype(np.int32)

pool = jnp.asarray(rng.standard_normal((npool, T, T)).astype(np.float32))
flops = 2.0 * ng * T**3

def sync(x):
    jax.block_until_ready(x)
    return float(np.asarray(x[-1])[-1, -1])

def timeit(name, op, reps=3):
    @jax.jit
    def many(p):
        return lax.fori_loop(0, K_IT, lambda i, q: op(q), p)
    out = many(pool); sync(out)   # compile
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = many(pool); sync(out)
        ts.append(time.perf_counter() - t0)
    t = min(ts) / K_IT
    print(f"{name:26s}: {t*1e3:8.2f} ms  {flops/t/1e12:6.2f} TF/s", flush=True)

for upd, tag in ((jnp.bfloat16, "bf16"), (None, "fp32-high")):
    print(f"--- update_dtype={tag} ng={ng} T={T} seg~{seg} K={K_IT} ---",
          flush=True)
    timeit("XLA gather-GEMM-scatter",
           lambda p, u=upd: K.gemm_scatter(p, ga, gb, gd, update_dtype=u,
                                           chunk=0))
    st = sort_triples(ga, gb, gd)
    timeit("fused r2 (serial DMA)",
           lambda p, u=upd: gemm_scatter_fused(p, *st, update_dtype=u))
    sched = build_pipeline_schedule(ga, gb, gd)
    timeit("pipelined r3",
           lambda p, u=upd: gemm_scatter_pipelined(p, sched, update_dtype=u))

from pastix_tpu.numeric.pallas_kernels import gemm_scatter_blockspec
for upd, tag in ((jnp.bfloat16, "bf16"), (None, "fp32-high")):
    print(f"--- blockspec update_dtype={tag} ---", flush=True)
    sched = build_pipeline_schedule(ga, gb, gd)
    timeit("blockspec (Mosaic pipe)",
           lambda p, u=upd: gemm_scatter_blockspec(p, sched, update_dtype=u))

for G in (2, 4, 8):
    print(f"--- pipelined group G={G} ---", flush=True)
    schedG = build_pipeline_schedule(ga, gb, gd, group=G)
    for upd, tag in ((jnp.bfloat16, "bf16"), (None, "fp32-high")):
        timeit(f"pipelined G={G} {tag}",
               lambda p, u=upd, s=schedG: gemm_scatter_pipelined(
                   p, s, update_dtype=u))

print("--- ab_pack variants ---", flush=True)
for G in (1, 2, 4):
    schedG = build_pipeline_schedule(ga, gb, gd, group=G)
    for upd, tag in ((jnp.bfloat16, "bf16"),):
        timeit(f"ab_pack G={G} {tag}",
               lambda p, u=upd, s=schedG: gemm_scatter_pipelined(
                   p, s, update_dtype=u, ab_pack=True))
