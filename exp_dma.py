"""Probe (TPU): raw HBM->VMEM DMA rate vs transfer size, random addresses.

Discriminates the E2 kernel's ~0.6 us/pair wall: per-descriptor issue cost
(time flat in transfer size) vs random-access bandwidth (time linear in
size).  Grid is 2D (repeats x steps) so the in-kernel DMA count is large
enough to swamp the ~50 ms tunnel sync (CLAUDE.md timing rule); the SMEM
index table is reused across repeats.

Run on TPU: python exp_dma.py [npool]
"""
import sys, time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

cache = "/root/.cache/pastix_jax"
try:
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

npool = int(sys.argv[1]) if len(sys.argv) > 1 else 12000
T = 128
rng = np.random.default_rng(0)
pool = jnp.asarray(rng.standard_normal((npool, T, T)).astype(np.float32))


def probe(S, D, steps, reps):
    idx = rng.integers(0, npool - S, (steps, D)).astype(np.int32)

    def kernel(idx_ref, pool_ref, out_ref, buf, sems, acc):
        r = pl.program_id(0)
        i = pl.program_id(1)
        g = r * steps + i  # global step

        def cp(step_mod, d, slot):
            return pltpu.make_async_copy(
                pool_ref.at[pl.ds(idx_ref[step_mod, d], S)],
                buf.at[slot, d],
                sems.at[slot, d],
            )

        @pl.when(g == 0)
        def _():
            for d in range(D):
                cp(0, d, 0).start()

        @pl.when(g + 1 < reps * steps)
        def _():
            nxt = (i + 1) % steps  # idx reused across repeats
            for d in range(D):
                cp(nxt, d, (g + 1) % 2).start()

        for d in range(D):
            cp(i, d, g % 2).wait()
        acc[:] = acc[:] + buf[g % 2, 0, 0, :1, :]

        @pl.when(g == reps * steps - 1)
        def _():
            out_ref[:] = acc[:]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(reps, steps),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, D, S, T, T), jnp.float32),
            pltpu.SemaphoreType.DMA((2, D)),
            pltpu.VMEM((1, T), jnp.float32),
        ],
    )
    fn = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((1, T), jnp.float32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )

    @jax.jit
    def run(pool):
        return fn(jnp.asarray(idx), pool)

    out = run(pool)
    jax.block_until_ready(out)
    float(np.asarray(out)[0, 0])
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = run(pool)
        jax.block_until_ready(out)
        float(np.asarray(out)[0, 0])
        ts.append(time.perf_counter() - t0)
    t = min(ts)
    ndma = reps * steps * D
    nbytes = ndma * S * T * T * 4
    print(
        f"S={S:>3} tiles ({S*64:>5} KB) D={D}: {t*1e6/ndma:8.3f} us/DMA, "
        f"{nbytes/t/1e9:7.1f} GB/s  (total {t*1e3:.0f} ms)",
        flush=True,
    )


for S, D, st, reps in [
    (1, 2, 1024, 128), (1, 4, 1024, 64), (1, 8, 512, 64),
    (2, 2, 1024, 64), (4, 2, 1024, 32), (8, 2, 512, 32),
    (16, 2, 256, 32), (32, 2, 128, 32),
]:
    probe(S, D, st, reps)

# --- sub-tile sizes: does a 32/16 KB DMA cost less than a 64 KB one? ---
pool2 = pool.reshape(npool * 2, 64, T)
pool4 = pool.reshape(npool * 4, 32, T)


def probe_sub(view, rows, S, D, steps, reps, label):
    nmax = view.shape[0] - S

    idx = rng.integers(0, nmax, (steps, D)).astype(np.int32)

    def kernel(idx_ref, pool_ref, out_ref, buf, sems, acc):
        r = pl.program_id(0)
        i = pl.program_id(1)
        g = r * steps + i

        def cp(step_mod, d, slot):
            return pltpu.make_async_copy(
                pool_ref.at[pl.ds(idx_ref[step_mod, d], S)],
                buf.at[slot, d],
                sems.at[slot, d],
            )

        @pl.when(g == 0)
        def _():
            for d in range(D):
                cp(0, d, 0).start()

        @pl.when(g + 1 < reps * steps)
        def _():
            nxt = (i + 1) % steps
            for d in range(D):
                cp(nxt, d, (g + 1) % 2).start()

        for d in range(D):
            cp(i, d, g % 2).wait()
        acc[:] = acc[:] + buf[g % 2, 0, 0, :1, :]

        @pl.when(g == reps * steps - 1)
        def _():
            out_ref[:] = acc[:]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(reps, steps),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, D, S, rows, T), jnp.float32),
            pltpu.SemaphoreType.DMA((2, D)),
            pltpu.VMEM((1, T), jnp.float32),
        ],
    )
    fn = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((1, T), jnp.float32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )

    @jax.jit
    def run(v):
        return fn(jnp.asarray(idx), v)

    out = run(view)
    jax.block_until_ready(out)
    float(np.asarray(out)[0, 0])
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = run(view)
        jax.block_until_ready(out)
        float(np.asarray(out)[0, 0])
        ts.append(time.perf_counter() - t0)
    t = min(ts)
    ndma = reps * steps * D
    nbytes = ndma * S * rows * T * 4
    print(
        f"{label}: D={D} {t*1e6/ndma:8.3f} us/DMA, "
        f"{nbytes/t/1e9:7.1f} GB/s", flush=True,
    )


print("--- sub-tile transfer sizes ---", flush=True)
for D in (2, 4, 8):
    probe_sub(pool2, 64, 1, D, 1024, 64, "32KB (64,128)")
for D in (2, 4, 8):
    probe_sub(pool4, 32, 1, D, 1024, 64, "16KB (32,128)")

print("--- deeper pipelines on sub-tile sizes (round-5: can row-bounded"
      " 16KB fetches escape the latency floor?) ---", flush=True)
for D in (12, 16):
    probe_sub(pool2, 64, 1, D, 512, 64, "32KB (64,128)")
for D in (12, 16):
    probe_sub(pool4, 32, 1, D, 512, 64, "16KB (32,128)")
