"""Focused A/B: the per-level DIAG chain, XLA vs the fused Pallas kernel.

exp_full.py (round 2) showed the DIAG chain (batched cholesky + diag-tile
inverse per level) is the factorization critical path: ~126 ms of 143 ms
at the 48^3 bench — XLA expands both into ~T-step loops whose every step
round-trips the batch through HBM.  chol_inv_pool_pallas keeps each tile
VMEM-resident for the whole elimination.

To keep remote-compile cost bounded, the per-level diag tables are padded
to power-of-two buckets so ALL levels share a handful of kernel shapes
(the DMA-skip sentinel makes pad slots nearly free).

Variants timed on the real chip (all over the REAL bench layout):
  xla-diag     : per-level potrf_batch + triangular_solve(eye)  (the
                 product path's DIAG+dinv work, updates stubbed)
  pallas-diag  : per-level chol_inv_pool_pallas, bucketed shapes
Run: python exp_diag.py    (PASTIX_EXP_NX=, PASTIX_EXP_CPU=1)
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
    from jax import lax

    log(f"backend {jax.default_backend()}")

    nx = int(os.environ.get("PASTIX_EXP_NX", "48"))
    from pastix_tpu.generators import poisson_3d
    from pastix_tpu.pastix import Pastix
    from pastix_tpu.config import PastixConfig
    from pastix_tpu.numeric import kernels as K
    from pastix_tpu.numeric.factorize import coefinit
    from pastix_tpu.numeric.pallas_kernels import chol_inv_pool_pallas

    A = poisson_3d(nx)
    solver = Pastix(A, PastixConfig(tile_size=128, packed_update=False))
    solver.analyze()
    lay = solver.layout
    levels = (
        solver._dense_tail.levels_lo
        if solver._dense_tail is not None
        else lay.levels
    )
    T, npool = lay.T, lay.npool
    log(f"n={A.n} T={T} npool={npool} nlevels={len(levels)} "
        f"diag sizes={[int(lv.diag.size) for lv in levels]}")

    pool0, _ = coefinit(lay, solver._A_perm, dtype=np.float32)
    pool0 = jnp.asarray(pool0)

    def sync(x):
        jax.block_until_ready(x)
        return float(np.asarray(x.ravel()[-1]))

    def timeit(name, fn, arg, reps=3):
        t0 = time.perf_counter()
        out = fn(arg)
        sync(out)
        log(f"{name}: first (compile+run) {time.perf_counter() - t0:.1f}s")
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn(arg)
            sync(out)
            ts.append(time.perf_counter() - t0)
        t = min(ts)
        log(f"{name}: {t * 1e3:.2f} ms")
        return t

    GBLK = 8

    def bucket_pad(nd):
        b = GBLK
        while b < nd:
            b *= 2
        return b

    diag_tabs = [jnp.asarray(lv.diag) for lv in levels]
    pad_tabs = []
    nbuckets = set()
    for lv in levels:
        nd = lv.diag.size
        npad = bucket_pad(nd)
        dpad = np.full(npad, npool, np.int32)
        dpad[:nd] = lv.diag
        pad_tabs.append(jnp.asarray(dpad))
        nbuckets.add(npad)
    log(f"pallas bucket shapes: {sorted(nbuckets)}")

    # --- XLA reference: per-level fused-loop chol+inv (the current product
    # default path computes potrf + triangular_solve(eye); time both) ------
    def xla_diag_potrf_inv(pool):
        for dt in diag_tabs:
            diag = K.potrf_batch(jnp.tril(pool[dt]))
            eye = jnp.broadcast_to(
                jnp.eye(T, dtype=pool.dtype), (dt.shape[0], T, T)
            )
            dinv = lax.linalg.triangular_solve(
                diag, eye, left_side=True, lower=True
            )
            pool = pool.at[dt].set(diag + 0 * dinv[:1])
        return pool

    def pallas_diag(pool):
        for dpad in pad_tabs:
            pool, dinv = chol_inv_pool_pallas(pool, dpad, block=GBLK)
            pool = pool.at[:1].add(0 * dinv[:1])  # keep dinv live
        return pool

    # correctness: diagonal tiles must factor identically (compare the
    # diag tiles only; neither variant runs TRSM/updates)
    outx = jax.jit(xla_diag_potrf_inv)(pool0)
    sync(outx)
    outp = jax.jit(pallas_diag)(pool0)
    sync(outp)
    di = np.concatenate([np.asarray(d) for d in diag_tabs])
    dx = np.asarray(outx[di])
    dp = np.asarray(outp[di])
    tri = np.tril_indices(T)
    err = np.nanmax(np.abs(dx[:, tri[0], tri[1]] - dp[:, tri[0], tri[1]]))
    log(f"diag-tile max |xla - pallas| (lower): {err:.3e}")

    timeit("xla potrf+inv", jax.jit(xla_diag_potrf_inv), pool0)
    timeit("pallas chol+inv", jax.jit(pallas_diag), pool0)


if __name__ == "__main__":
    if os.environ.get("PASTIX_EXP_CHILD") or os.environ.get("PASTIX_EXP_CPU"):
        main()
    else:
        import subprocess

        env = dict(os.environ, PASTIX_EXP_CHILD="1")
        r = subprocess.run([sys.executable, __file__], env=env, timeout=2400,
                           capture_output=True, text=True)
        sys.stderr.write(r.stderr)
        sys.stdout.write(r.stdout)
        if r.returncode != 0:
            log(f"TPU child failed rc={r.returncode}")
