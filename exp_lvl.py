"""Isolate packed-vs-grid E2 cost on the REAL bench level tables.

Builds the 48^3 T=128 layout + packed plan, picks the heaviest levels, and
times on the TPU:
  grid    : pool[ga],pool[gb] gemm -> pool.at[gd].add        (tile scatter)
  packed  : p2[gidx] trsm-skip; O[pa] x pool[pgb] gemm -> p2.at[dst].add
  packed-nosc : same gemm, scatter replaced by sum reduction
  packed-nogemm : gather + scatter of a broadcast W
Run: python exp_lvl.py   (PASTIX_EXP_CPU=1 for CPU)
"""

import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax

    if os.environ.get("PASTIX_EXP_CPU"):
        jax.config.update("jax_platforms", "cpu")
    cache_dir = "/root/.cache/pastix_jax"
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    log(f"backend {jax.default_backend()}")

    nx = int(os.environ.get("PASTIX_EXP_NX", "48"))
    from pastix_tpu.generators import poisson_3d
    from pastix_tpu.pastix import Pastix
    from pastix_tpu.config import PastixConfig

    A = poisson_3d(nx)
    solver = Pastix(A, PastixConfig(tile_size=128))
    solver.analyze()
    lay = solver.layout
    plan = solver._packed_plan
    levels = (
        solver._dense_tail.levels_lo
        if solver._dense_tail is not None
        else lay.levels
    )
    T, npool = lay.T, lay.npool

    # aggregate stats
    ng_grid = sum(lv.gemm_a.size for lv in levels)
    ng_pack = sum(pl.pa.size for pl in plan.levels)
    nc_pack = sum(pl.nchunk for pl in plan.levels)
    nt_grid = sum(lv.trsm_panel.size for lv in levels)
    log(f"levels={len(levels)} grid pairs={ng_grid} trsm tiles={nt_grid}")
    log(f"packed pairs={ng_pack} chunks={nc_pack} "
        f"(pair ratio {ng_pack/ng_grid:.3f})")

    # heaviest level by grid pairs
    li = int(np.argmax([lv.gemm_a.size for lv in levels]))
    lv, pl = levels[li], plan.levels[li]
    log(f"heaviest level {li}: grid ng={lv.gemm_a.size} "
        f"packed ng={pl.pa.size} chunks={pl.nchunk}")

    rng = np.random.default_rng(0)
    pool = jnp.asarray(
        rng.standard_normal((npool, T, T)).astype(np.float32) * 0.01
    )

    ga = jnp.asarray(lv.gemm_a)
    gb = jnp.asarray(lv.gemm_b)
    gd = jnp.asarray(lv.gemm_d)
    gidx = jnp.asarray(pl.gidx)
    pa = jnp.asarray(pl.pa)
    pgb = jnp.asarray(pl.pgb)
    dst = jnp.asarray(pl.dst)

    def sync(x):
        jax.block_until_ready(x)
        return float(np.asarray(x.ravel()[-1]))

    def timeit(name, fn, *args, reps=5, flops=None):
        out = fn(*args)
        sync(out)
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn(*args)
            sync(out)
            ts.append(time.perf_counter() - t0)
        t = min(ts)
        extra = f" ({flops/t/1e12:.2f} TF/s)" if flops else ""
        log(f"{name}: {t*1e3:.2f} ms{extra}")
        return t

    upd = jnp.bfloat16

    def grid_e2(pool):
        a = pool[ga].astype(upd)
        b = pool[gb].astype(upd)
        W = jnp.einsum("gij,gkj->gik", a, b,
                       preferred_element_type=jnp.float32)
        return pool.at[gd].add(-W)

    timeit("grid E2 (real level)", jax.jit(grid_e2), pool,
           flops=2 * lv.gemm_a.size * T**3)

    def packed_e2(pool):
        p2 = pool.reshape(npool * T, T)
        O = p2[gidx]
        a = O[pa].astype(upd)
        b = p2.reshape(npool, T, T)[pgb].astype(upd)
        W = jnp.einsum("gij,gkj->gik", a, b,
                       preferred_element_type=jnp.float32)
        return p2.at[dst].add(-W).reshape(pool.shape)

    timeit("packed E2 (real level)", jax.jit(packed_e2), pool,
           flops=2 * pl.pa.size * T**3)

    def packed_nosc(pool):
        p2 = pool.reshape(npool * T, T)
        O = p2[gidx]
        a = O[pa].astype(upd)
        b = p2.reshape(npool, T, T)[pgb].astype(upd)
        W = jnp.einsum("gij,gkj->gik", a, b,
                       preferred_element_type=jnp.float32)
        return pool + W.sum() * 0

    timeit("packed gemm only (scatter->sum)", jax.jit(packed_nosc), pool,
           flops=2 * pl.pa.size * T**3)

    def packed_nogemm(pool):
        p2 = pool.reshape(npool * T, T)
        W = jnp.broadcast_to(pool[0], (pl.pa.size, T, T))
        return p2.at[dst].add(-W).reshape(pool.shape)

    timeit("packed scatter only (const W)", jax.jit(packed_nogemm), pool)

    def grid_nogemm(pool):
        W = jnp.broadcast_to(pool[0], (lv.gemm_a.size, T, T))
        return pool.at[gd].add(-W)

    timeit("grid scatter only (const W)", jax.jit(grid_nogemm), pool)

    def packed_sorted(pool):
        p2 = pool.reshape(npool * T, T)
        O = p2[gidx]
        a = O[pa].astype(upd)
        b = p2.reshape(npool, T, T)[pgb].astype(upd)
        W = jnp.einsum("gij,gkj->gik", a, b,
                       preferred_element_type=jnp.float32)
        return p2.at[dst].add(-W, indices_are_sorted=False,
                              mode="drop").reshape(pool.shape)

    timeit("packed E2 mode=drop", jax.jit(packed_sorted), pool,
           flops=2 * pl.pa.size * T**3)

    # full-factorization comparison on this pool (both programs)
    from pastix_tpu.numeric.factorize import build_factorize_fn
    from pastix_tpu.config import Factorization

    f_grid = build_factorize_fn(lay, Factorization.LLT, use_pallas=False,
                                update_dtype=np.dtype("bfloat16").type,
                                dense_tail=solver._dense_tail)
    f_pack = build_factorize_fn(lay, Factorization.LLT, use_pallas=False,
                                update_dtype=np.dtype("bfloat16").type,
                                dense_tail=solver._dense_tail,
                                packed_plan=plan)
    from pastix_tpu.numeric.factorize import coefinit
    pool0, _ = coefinit(lay, solver._A_perm, dtype=np.float32)
    pool0 = jnp.asarray(pool0)
    timeit("FULL grid fact", f_grid, pool0, reps=3,
           flops=solver.report.fact_flops)
    timeit("FULL packed fact", f_pack, pool0, reps=3,
           flops=solver.report.fact_flops)


if __name__ == "__main__":
    if os.environ.get("PASTIX_EXP_CHILD") or os.environ.get("PASTIX_EXP_CPU"):
        main()
    else:
        import subprocess

        env = dict(os.environ, PASTIX_EXP_CHILD="1")
        r = subprocess.run([sys.executable, __file__], env=env, timeout=3000,
                           capture_output=True, text=True)
        sys.stderr.write(r.stderr)
        sys.stdout.write(r.stdout)
        if r.returncode != 0:
            log(f"TPU child failed rc={r.returncode}")
