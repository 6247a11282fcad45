"""One-process TPU experiment series (the tunnel favors long-lived sessions).

Stages (select with EXP_STAGES=comma list; default all):
  tail   — factorization with/without the dense terminal block at EXP_NX
  solve  — classic vs fast (inverse-diag) solve, nrhs 1/16, dense tail on
  scale  — factor+solve ladder at growing nx (EXP_SCALE_NX, default 64,80)
  big    — 1M-dof attempt (EXP_BIG_NX, default 100): analysis on host,
           factorization+solve on device, memory report
  kernels— batched tile-kernel microbench roofline

Every stage is independent; partial results survive tunnel flaps.
"""

import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, flush=True)


def sync(x):
    import jax

    jax.block_until_ready(x)
    return float(np.asarray(x[-1])[-1, -1]) if hasattr(x, "ndim") else x


def main():
    import jax

    cache = "/root/.cache/pastix_jax"
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    log(f"backend: {jax.default_backend()} {jax.devices()}")

    from pastix_tpu.pastix import Pastix
    from pastix_tpu.config import PastixConfig, Factorization
    from pastix_tpu.numeric.factorize import (
        coefinit,
        build_factorize_fn,
        build_diag_inverse_fn,
    )
    from pastix_tpu.solve import (
        build_solve_fn,
        build_solve_fn_inv,
        rhs_to_blocks,
        blocks_to_rhs,
    )
    from pastix_tpu.generators import poisson_3d

    stages = os.environ.get("EXP_STAGES", "tail,solve,scale,kernels").split(",")
    nx = int(os.environ.get("EXP_NX", "48"))

    def prep(A, T, dense_tail=True):
        t0 = time.perf_counter()
        s = Pastix(A, PastixConfig(tile_size=T, dense_tail=dense_tail))
        s.order(); s.symbfact(); s.analyze()
        t_an = time.perf_counter() - t0
        pool0, _ = coefinit(s.layout, s._A_perm, dtype=np.float32)
        return s, jnp.asarray(pool0), t_an

    def time_fn(fn, *args, reps=3):
        out = fn(*args)
        sync(out[0] if isinstance(out, tuple) else out)
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn(*args)
            sync(out[0] if isinstance(out, tuple) else out)
            ts.append(time.perf_counter() - t0)
        return min(ts)

    if "tail" in stages:
        A = poisson_3d(nx)
        for tail in (True, False):
            try:
                s, pool, _ = prep(A, int(os.environ.get("EXP_T", "64")), dense_tail=tail)
                lay = s.layout
                fact = build_factorize_fn(
                    lay, Factorization.LLT, donate=False,
                    dense_tail=s._dense_tail,
                )
                t0 = time.perf_counter()
                t = time_fn(fact, pool)
                useful = s.report.fact_flops
                padded = lay.padded_flops()
                log(
                    f"[fact nx={nx} tail={tail}] {1e3 * t:.1f} ms  "
                    f"useful {useful / t / 1e9:.1f} GF/s  "
                    f"device {padded / t / 1e9:.1f} GF/s  "
                    f"tiles={lay.npool} levels={s.report.n_levels} "
                    f"m_tail={s.report.dense_tail_m} "
                    f"(first+compile {time.perf_counter() - t0 - 3 * t:.1f}s)"
                )
            except Exception as e:
                log(f"[fact nx={nx} tail={tail}] FAILED: {str(e)[:200]}")

    if "solve" in stages:
        try:
            A = poisson_3d(nx)
            s, pool, _ = prep(A, int(os.environ.get("EXP_T", "64")))
            lay = s.layout
            fact = build_factorize_fn(
                lay, Factorization.LLT, donate=False, dense_tail=s._dense_tail
            )
            fpool = fact(pool)
            sync(fpool)
            b = s._A_perm @ np.ones(s._ext_n)
            bb = jnp.asarray(rhs_to_blocks(lay, b, dtype=np.float32))

            solv = build_solve_fn(
                lay, Factorization.LLT, dense_tail=s._dense_tail
            )
            t = time_fn(solv, fpool, bb)
            log(f"[solve classic nx={nx} nrhs=1] {1e3 * t:.1f} ms")

            dinv = build_diag_inverse_fn(lay, Factorization.LLT)(fpool)
            sync(dinv)
            solv_f = build_solve_fn_inv(
                lay, Factorization.LLT, dense_tail=s._dense_tail
            )
            tf = time_fn(solv_f, fpool, dinv, bb)
            log(f"[solve fast    nx={nx} nrhs=1] {1e3 * tf:.1f} ms")

            x = blocks_to_rhs(lay, np.asarray(solv_f(fpool, dinv, bb)))[:, 0]
            r = np.linalg.norm(b - s._A_perm @ x) / np.linalg.norm(b)
            log(f"[fast-solve residual (no refine)] {r:.2e}")
            bb16 = jnp.asarray(
                rhs_to_blocks(lay, np.tile(b[:, None], (1, 16)), dtype=np.float32)
            )
            t16 = time_fn(solv_f, fpool, dinv, bb16)
            log(f"[solve fast    nx={nx} nrhs=16] {1e3 * t16:.1f} ms")
        except Exception as e:
            log(f"[solve] FAILED: {str(e)[:200]}")

    if "scale" in stages:
        for sx in [
            int(v) for v in os.environ.get("EXP_SCALE_NX", "64,80").split(",")
        ]:
            try:
                A = poisson_3d(sx)
                s, pool, t_an = prep(A, int(os.environ.get("EXP_T", "64")))
                lay = s.layout
                fact = build_factorize_fn(
                    lay, Factorization.LLT, donate=False,
                    dense_tail=s._dense_tail,
                )
                t = time_fn(fact, pool, reps=2)
                useful = s.report.fact_flops
                padded = lay.padded_flops()
                gb = lay.npool * lay.T * lay.T * 4 / 1e9
                log(
                    f"[scale nx={sx} n={A.n}] fact {1e3 * t:.0f} ms  "
                    f"useful {useful / t / 1e9:.1f} GF/s  "
                    f"device {padded / t / 1e9:.1f} GF/s  pool {gb:.2f} GB  "
                    f"levels={s.report.n_levels} m_tail={s.report.dense_tail_m} "
                    f"analysis {t_an:.1f}s"
                )
                del pool, fact
            except Exception as e:
                log(f"[scale nx={sx}] FAILED: {str(e)[:200]}")

    if "big" in stages:
        sx = int(os.environ.get("EXP_BIG_NX", "100"))
        try:
            A = poisson_3d(sx)
            s, pool, t_an = prep(A, int(os.environ.get("EXP_T", "64")))
            lay = s.layout
            fact = build_factorize_fn(
                lay, Factorization.LLT, donate=True, dense_tail=s._dense_tail
            )
            gb = lay.npool * lay.T * lay.T * 4 / 1e9
            log(
                f"[big nx={sx} n={A.n}] pool {gb:.2f} GB tiles={lay.npool} "
                f"levels={s.report.n_levels} m_tail={s.report.dense_tail_m} "
                f"analysis {t_an:.1f}s"
            )
            t0 = time.perf_counter()
            fpool = fact(pool)
            sync(fpool)
            t_first = time.perf_counter() - t0
            useful = s.report.fact_flops
            log(
                f"[big nx={sx}] first fact (compile+run) {t_first:.1f}s"
            )
            import jax.numpy as jnp2

            pool2, _ = coefinit(lay, s._A_perm, dtype=np.float32)
            pool2 = jnp.asarray(pool2)
            t0 = time.perf_counter()
            fpool = fact(pool2)
            sync(fpool)
            t = time.perf_counter() - t0
            log(
                f"[big nx={sx}] steady fact {t:.2f}s  "
                f"useful {useful / t / 1e9:.1f} GF/s  "
                f"device {lay.padded_flops() / t / 1e9:.1f} GF/s"
            )
            b = s._A_perm @ np.ones(s._ext_n)
            bb = jnp.asarray(rhs_to_blocks(lay, b, dtype=np.float32))
            solv = build_solve_fn(
                lay, Factorization.LLT, dense_tail=s._dense_tail
            )
            ts = time_fn(solv, fpool, bb, reps=2)
            x = blocks_to_rhs(lay, np.asarray(solv(fpool, bb)))[:, 0]
            r = np.linalg.norm(b - s._A_perm @ x) / np.linalg.norm(b)
            log(f"[big nx={sx}] solve {1e3 * ts:.0f} ms  residual {r:.2e}")
        except Exception as e:
            log(f"[big nx={sx}] FAILED: {str(e)[:300]}")

    if "gsbench" in stages:
        # where does per-level time go? isolate the data movement primitives
        # on a realistic pool: indexed gather vs contiguous slice vs
        # scatter-add vs batched matmul
        try:
            from jax import lax

            npool, T = 40000, 64
            B = 4096
            rng = np.random.default_rng(0)
            # NB: pass all device arrays as ARGUMENTS (closing a jitted fn
            # over a device array hangs tracing over the remote tunnel)
            pool = jnp.asarray(
                rng.standard_normal((npool, T, T), dtype=np.float32)
            )
            idx = jnp.asarray(rng.integers(0, npool, B, dtype=np.int32))
            idx_sorted = jnp.sort(idx)
            contrib = jnp.asarray(
                rng.standard_normal((B, T, T), dtype=np.float32)
            )

            LOOPS = int(os.environ.get("EXP_LOOPS", "200"))

            def run(name, fn, *args, flops=0.0, bts=0.0):
                # a single dispatch over the tunnel costs ~45 ms: measure
                # the op looped INSIDE one jitted program and subtract a
                # measured empty-loop baseline
                def looped(*a):
                    def body(i, acc):
                        out = fn(*a)
                        # fold a data dependence so the loop isn't DCE'd
                        return acc + out.ravel()[0].astype(jnp.float32)

                    return lax.fori_loop(0, LOOPS, body, jnp.float32(0)).reshape(
                        1, 1, 1
                    )

                f = jax.jit(looped)
                t = time_fn(f, *args, reps=5) / LOOPS
                extra = ""
                if flops:
                    extra += f"  {flops / t / 1e9:.0f} GF/s"
                if bts:
                    extra += f"  {bts / t / 1e9:.0f} GB/s"
                log(f"[gs {name}] {1e3 * t:.3f} ms{extra}")

            run("empty", lambda p: p[:1], pool)

            tile_b = B * T * T * 4.0
            run("gather_rand", lambda p, i: p[i] + 1.0, pool, idx,
                bts=2 * tile_b)
            run("gather_sorted", lambda p, i: p[i] + 1.0, pool, idx_sorted,
                bts=2 * tile_b)
            run(
                "slice",
                lambda p: lax.dynamic_slice(p, (1000, 0, 0), (B, T, T)) + 1.0,
                pool, bts=2 * tile_b,
            )
            run(
                "scatter_add",
                lambda p, i, c: p.at[i].add(c),
                pool, idx, contrib, bts=3 * tile_b,
            )
            run(
                "bmm",
                lambda c: jnp.einsum(
                    "bij,bkj->bik", c, c, preferred_element_type=jnp.float32
                ),
                contrib, flops=2.0 * B * T**3,
            )
            run(
                "gather_bmm_scatter",
                lambda p, i, i2: p.at[i].add(
                    jnp.einsum(
                        "bij,bkj->bik", p[i], p[i2],
                        preferred_element_type=jnp.float32,
                    )
                ),
                pool, idx, idx_sorted, flops=2.0 * B * T**3,
            )
        except Exception as e:
            log(f"[gsbench] FAILED: {str(e)[:200]}")

    if "kernels" in stages:
        try:
            from pastix_tpu.perf import measure_kernels

            for T, B in ((128, 256), (128, 1024), (64, 1024)):
                t = measure_kernels(T, B)
                log(
                    f"[kernels T={T} B={B}] "
                    + "  ".join(f"{k}={v.gflops:.0f}GF/s" for k, v in t.items())
                )
        except Exception as e:
            log(f"[kernels] FAILED: {str(e)[:200]}")


if __name__ == "__main__":
    main()
