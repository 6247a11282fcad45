"""One-process TPU experiment series (the tunnel favors long-lived sessions).

Runs, in a single connected process: factorization steady-state at T=128
(fused Pallas path) vs the XLA path, T=64, solve timing, and kernel
microbenches.  Every stage is independent; partial results survive flaps.
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
    from pastix_tpu.numeric.factorize import coefinit, build_factorize_fn
    from pastix_tpu.solve import build_solve_fn, rhs_to_blocks
    from pastix_tpu.generators import poisson_3d

    nx = int(os.environ.get("EXP_NX", "32"))
    A = poisson_3d(nx)

    def prep(T):
        s = Pastix(A, PastixConfig(tile_size=T))
        s.order(); s.symbfact(); s.analyze()
        pool0, _ = coefinit(s.layout, s._A_perm, dtype=np.float32)
        return s, jnp.asarray(pool0)

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

    results = {}
    for T, pallas in ((64, False), (128, False), (128, True)):
        try:
            s, pool = prep(T)
            lay = s.layout
            fact = build_factorize_fn(
                lay, Factorization.LLT, use_pallas=pallas, donate=False
            )
            t = time_fn(fact, pool)
            useful = s.report.fact_flops
            padded = lay.padded_flops()
            tag = f"T={T} pallas={pallas}"
            results[tag] = t
            log(
                f"[fact {tag}] {1e3 * t:.1f} ms  useful {useful / t / 1e9:.1f} "
                f"GF/s  device {padded / t / 1e9:.1f} GF/s  "
                f"tiles={lay.npool} levels={len(lay.levels)}"
            )
        except Exception as e:
            log(f"[fact T={T} pallas={pallas}] FAILED: {str(e)[:200]}")

    # solve timing (classic vs fast) at T=64
    try:
        from pastix_tpu.numeric.factorize import build_diag_inverse_fn
        from pastix_tpu.solve import build_solve_fn_inv, blocks_to_rhs

        s, pool = prep(64)
        lay = s.layout
        fact = build_factorize_fn(
            lay, Factorization.LLT, use_pallas=False, donate=False
        )
        fpool = fact(pool)
        sync(fpool)
        b = s._A_perm @ np.ones(s._ext_n)
        bb = jnp.asarray(rhs_to_blocks(lay, b, dtype=np.float32))

        solv = build_solve_fn(lay, Factorization.LLT)
        t = time_fn(solv, fpool, bb)
        log(f"[solve classic T=64 nrhs=1] {1e3 * t:.1f} ms")

        dinv = build_diag_inverse_fn(lay, Factorization.LLT)(fpool)
        sync(dinv)
        solv_f = build_solve_fn_inv(lay, Factorization.LLT)
        tf = time_fn(solv_f, fpool, dinv, bb)
        log(f"[solve fast    T=64 nrhs=1] {1e3 * tf:.1f} ms")

        x = blocks_to_rhs(lay, np.asarray(solv_f(fpool, dinv, bb)))[:, 0]
        r = np.linalg.norm(b - s._A_perm @ x) / np.linalg.norm(b)
        log(f"[fast-solve residual (no refine)] {r:.2e}")
        bb16 = jnp.asarray(
            rhs_to_blocks(lay, np.tile(b[:, None], (1, 16)), dtype=np.float32)
        )
        t16 = time_fn(solv_f, fpool, dinv, bb16)
        log(f"[solve fast    T=64 nrhs=16] {1e3 * t16:.1f} ms")
    except Exception as e:
        log(f"[solve] FAILED: {str(e)[:200]}")

    # kernel microbench
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
