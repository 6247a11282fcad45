"""TPU microbench: element-level scatter-add for the packed E2 design.

Measures, on realistic bench-level shapes:
  A) tile-level scatter-add        pool.at[gd].add(W)        (current E2 tail)
  B) element scatter-add           pool_flat.at[dst].add(W)  dst (B,T,T) int32
  C) B + on-device dst computation (TBcat gather + index arithmetic)
  D) packed E2 end-to-end: gather rows -> GEMM -> dst -> scatter
  E) current E2 end-to-end: gather tiles -> GEMM -> tile scatter

Run on the TPU (subprocess-guarded like bench.py).  PASTIX_EXP_CPU=1 for CPU.
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

    log(f"backend {jax.default_backend()} devices {jax.devices()}")

    T = 128
    npool = 13350
    ng = 2048  # triples per heavy level
    B = 1024  # chunks per level
    rng = np.random.default_rng(0)

    pool = jnp.asarray(rng.standard_normal((npool, T, T)).astype(np.float32))
    flat_len = npool * T * T

    def sync(x):
        jax.block_until_ready(x)
        xf = x[0] if isinstance(x, tuple) else x
        return float(np.asarray(xf.ravel()[-1]))

    def timeit(name, fn, *args, reps=5):
        out = fn(*args)
        sync(out)
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn(*args)
            sync(out)
            ts.append(time.perf_counter() - t0)
        t = min(ts)
        log(f"{name}: {t*1e3:.2f} ms")
        return t

    # A) tile-level scatter-add
    gd = jnp.asarray(rng.integers(0, npool, ng).astype(np.int32))
    W = jnp.asarray(rng.standard_normal((ng, T, T)).astype(np.float32))

    tA = timeit("A tile scatter (ng=2048)", jax.jit(lambda p, w, g: p.at[g].add(w)), pool, W, gd)
    log(f"   -> {ng*T*T*12/tA/1e9:.1f} GB/s effective")

    # B) element scatter-add, random tiles but structured within-tile
    base = rng.integers(0, npool, ng).astype(np.int64) * (T * T)
    dst_np = (base[:, None, None]
              + np.arange(T, dtype=np.int64)[None, :, None] * T
              + np.arange(T, dtype=np.int64)[None, None, :]).astype(np.int32)
    dst = jnp.asarray(dst_np)
    tB = timeit(
        "B elem scatter (ng=2048, dst precomputed)",
        jax.jit(lambda p, w, d: p.reshape(-1).at[d.reshape(-1)].add(w.reshape(-1)).reshape(p.shape)),
        pool, W, dst,
    )
    log(f"   -> {ng*T*T*16/tB/1e9:.1f} GB/s effective")

    # B2) element scatter with per-row permuted locations (closer to real:
    # contiguous lanes within a row, rows shuffled)
    rloc = np.stack([rng.permutation(T) for _ in range(ng)]).astype(np.int32)
    dst2 = (base[:, None, None] + rloc[:, :, None].astype(np.int64) * T
            + np.arange(T, dtype=np.int64)[None, None, :]).astype(np.int32)
    dst2 = jnp.asarray(dst2)
    tB2 = timeit(
        "B2 elem scatter (rows shuffled)",
        jax.jit(lambda p, w, d: p.reshape(-1).at[d.reshape(-1)].add(w.reshape(-1)).reshape(p.shape)),
        pool, W, dst2,
    )
    log(f"   -> {ng*T*T*16/tB2/1e9:.1f} GB/s effective")

    # B3) fully element-shuffled lanes too
    cloc = np.stack([rng.permutation(T) for _ in range(ng)]).astype(np.int32)
    dst3 = (base[:, None, None] + rloc[:, :, None].astype(np.int64) * T
            + cloc[:, None, :].astype(np.int64)).astype(np.int32)
    dst3 = jnp.asarray(dst3)
    tB3 = timeit(
        "B3 elem scatter (rows+lanes shuffled)",
        jax.jit(lambda p, w, d: p.reshape(-1).at[d.reshape(-1)].add(w.reshape(-1)).reshape(p.shape)),
        pool, W, dst3,
    )
    log(f"   -> {ng*T*T*16/tB3/1e9:.1f} GB/s effective")

    # C) dst computed on device from per-chunk maps + TBcat
    m = 12
    TBcat = jnp.asarray(rng.integers(0, npool, B * (m + 1) ** 2).astype(np.int32))
    tbr = jnp.asarray(rng.integers(0, B * (m + 1) ** 2 - m, (B, T)).astype(np.int32))
    tib = jnp.asarray(rng.integers(0, m, (B, T)).astype(np.int32))
    rl = jnp.asarray(np.tile(np.arange(T, dtype=np.int32), (B, 1)))
    pa = jnp.asarray(rng.integers(0, B, ng).astype(np.int32))
    pb = jnp.asarray(rng.integers(0, B, ng).astype(np.int32))

    def packed_dst(p, w, TBcat, tbr, tib, rl, pa, pb):
        tb = TBcat[tbr[pa][:, :, None] + tib[pb][:, None, :]]
        d = tb * (T * T) + rl[pa][:, :, None] * T + rl[pb][:, None, :]
        return p.reshape(-1).at[d.reshape(-1)].add(w.reshape(-1)).reshape(p.shape)

    tC = timeit("C dst-on-device + elem scatter", jax.jit(packed_dst),
                pool, W, TBcat, tbr, tib, rl, pa, pb)

    # D) packed E2 end-to-end: row gather -> GEMM -> scatter
    gidx = jnp.asarray(rng.integers(0, npool * T, (B, T)).astype(np.int32))

    def packed_e2(p, TBcat, tbr, tib, rl, pa, pb, gidx):
        p2 = p.reshape(npool * T, T)
        O = p2[gidx]  # (B, T, T) packed chunks
        Wc = jnp.einsum("gij,gkj->gik", O[pa], O[pb],
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGH)
        tb = TBcat[tbr[pa][:, :, None] + tib[pb][:, None, :]]
        d = tb * (T * T) + rl[pa][:, :, None] * T + rl[pb][:, None, :]
        return p.reshape(-1).at[d.reshape(-1)].add(-Wc.reshape(-1)).reshape(p.shape)

    tD = timeit("D packed E2 (gather+gemm+scatter)", jax.jit(packed_e2),
                pool, TBcat, tbr, tib, rl, pa, pb, gidx)
    log(f"   -> {2*ng*T**3/tD/1e12:.2f} TF/s over the GEMM flops")

    # D-bf16
    def packed_e2_bf16(p, TBcat, tbr, tib, rl, pa, pb, gidx):
        p2 = p.reshape(npool * T, T)
        O = p2[gidx]
        Ob = O.astype(jnp.bfloat16)
        Wc = jnp.einsum("gij,gkj->gik", Ob[pa], Ob[pb],
                        preferred_element_type=jnp.float32)
        tb = TBcat[tbr[pa][:, :, None] + tib[pb][:, None, :]]
        d = tb * (T * T) + rl[pa][:, :, None] * T + rl[pb][:, None, :]
        return p.reshape(-1).at[d.reshape(-1)].add(-Wc.reshape(-1)).reshape(p.shape)

    tDb = timeit("D packed E2 bf16", jax.jit(packed_e2_bf16),
                 pool, TBcat, tbr, tib, rl, pa, pb, gidx)
    log(f"   -> {2*ng*T**3/tDb/1e12:.2f} TF/s over the GEMM flops")

    # E) current E2: tile gather + GEMM + tile scatter, same flops
    ga = jnp.asarray(rng.integers(0, npool, ng).astype(np.int32))
    gb = jnp.asarray(rng.integers(0, npool, ng).astype(np.int32))

    def tile_e2(p, ga, gb, gd):
        Wc = jnp.einsum("gij,gkj->gik", p[ga], p[gb],
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGH)
        return p.at[gd].add(-Wc)

    tE = timeit("E tile E2 (gather+gemm+scatter)", jax.jit(tile_e2),
                pool, ga, gb, gd)
    log(f"   -> {2*ng*T**3/tE/1e12:.2f} TF/s over the GEMM flops")

    # F) ROW-granular scatter-add: dstrow (ng, T) rows into p2 (npool*T, T)
    dstrow_np = rng.integers(0, npool * T, (ng, T)).astype(np.int32)
    dstrow = jnp.asarray(dstrow_np)

    def row_scatter(p, w, d):
        p2 = p.reshape(npool * T, T)
        return p2.at[d].add(w).reshape(p.shape)

    tF = timeit("F row scatter (ng=2048, (ng,T) rows)", jax.jit(row_scatter),
                pool, W, dstrow)
    log(f"   -> {ng*T*T*12/tF/1e9:.1f} GB/s effective")

    # F2) row scatter, rows sorted within each chunk (realistic: supp sorted)
    dstrow2 = jnp.asarray(np.sort(dstrow_np, axis=1))
    tF2 = timeit("F2 row scatter (rows sorted per chunk)", jax.jit(row_scatter),
                 pool, W, dstrow2)
    log(f"   -> {ng*T*T*12/tF2/1e9:.1f} GB/s effective")

    # G) HALF-packed E2 end-to-end: packed a-rows x grid b-tile ->
    #    row-granular scatter, dst rows computed on device
    ptb = jnp.asarray(rng.integers(0, m, ng).astype(np.int32))
    pgb = jnp.asarray(rng.integers(0, npool, ng).astype(np.int32))

    def half_e2(p, TBcat, tbr, rl, pa, ptb, pgb, gidx):
        p2 = p.reshape(npool * T, T)
        O = p2[gidx]  # (B, T, T) packed a-chunks
        Wc = jnp.einsum("gij,gkj->gik", O[pa], p[pgb],
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGH)
        tb = TBcat[tbr[pa] + ptb[:, None]]  # (ng, T) target tile per row
        d = tb * T + rl[pa]
        return p2.at[d].add(-Wc).reshape(p.shape)

    tG = timeit("G half-packed E2 (row scatter)", jax.jit(half_e2),
                pool, TBcat, tbr, rl, pa, ptb, pgb, gidx)
    log(f"   -> {2*ng*T**3/tG/1e12:.2f} TF/s over the GEMM flops")

    def half_e2_bf16(p, TBcat, tbr, rl, pa, ptb, pgb, gidx):
        p2 = p.reshape(npool * T, T)
        O = p2[gidx]
        Wc = jnp.einsum("gij,gkj->gik", O[pa].astype(jnp.bfloat16),
                        p[pgb].astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
        tb = TBcat[tbr[pa] + ptb[:, None]]
        d = tb * T + rl[pa]
        return p2.at[d].add(-Wc).reshape(p.shape)

    tGb = timeit("G half-packed E2 bf16", jax.jit(half_e2_bf16),
                 pool, TBcat, tbr, rl, pa, ptb, pgb, gidx)
    log(f"   -> {2*ng*T**3/tGb/1e12:.2f} TF/s over the GEMM flops")


if __name__ == "__main__":
    if os.environ.get("PASTIX_EXP_CHILD") or os.environ.get("PASTIX_EXP_CPU"):
        main()
    else:
        import subprocess

        env = dict(os.environ, PASTIX_EXP_CHILD="1")
        r = subprocess.run([sys.executable, __file__], env=env, timeout=1800,
                           capture_output=True, text=True)
        sys.stderr.write(r.stderr)
        sys.stdout.write(r.stdout)
        if r.returncode != 0:
            log(f"TPU child failed rc={r.returncode}")
