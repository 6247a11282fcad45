"""Kernel performance model — the machine-model analog.

The reference ships polynomial timing models per platform
(``src/perf/src/perf.h``: PERF_GEMM/TRSM/POTRF coefficient headers,
consumed by blend's cost functions — SURVEY.md section 2 row 8).  Here the
model is *measured*: each batched tile kernel is timed at the shape
buckets the layout actually uses, cached per (backend, dtype, T), and used
for roofline/speed-of-light reporting in benchmarks and the solve report.
"""

from __future__ import annotations

import dataclasses
import functools
import json
import os
import time

import numpy as np


@dataclasses.dataclass
class KernelTiming:
    name: str
    batch: int
    T: int
    seconds: float
    flops: float

    @property
    def gflops(self) -> float:
        return self.flops / self.seconds / 1e9


_LOOP_K = 8  # op iterations per timed program


def _time_fn(fn, *args, reps: int = 5) -> float:
    """Best-of-reps seconds per OP, with the op iterated _LOOP_K times
    INSIDE one jitted program: a device->host sync through the remote-TPU
    tunnel costs ~50 ms and would swamp (and falsify) per-call timing —
    the calibration must measure the op, not the tunnel."""
    import jax
    from jax import lax

    @jax.jit
    def many(*a):
        def body(_, carry):
            return fn(*carry)
        return lax.fori_loop(0, _LOOP_K, body, a)

    def sync(out):
        # block_until_ready does NOT reliably block on the remote-TPU
        # tunnel platform — force completion with a one-element
        # device->host read of the first output leaf
        leaf = jax.tree_util.tree_leaves(out)[0]
        return float(np.real(np.asarray(leaf.ravel()[-1:])[0]))

    out = many(*args)
    sync(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = many(*args)
        sync(out)
        best = min(best, time.perf_counter() - t0)
    return best / _LOOP_K


@functools.lru_cache(maxsize=64)
def measure_kernels(T: int, batch: int, dtype_str: str = "float32"):
    """Measured latency of the three task-body kernels at (batch, T).

    Returns {name: KernelTiming}.  Cached per process (the perf.h analog:
    one calibration per machine/shape).
    """
    import jax
    import jax.numpy as jnp

    from pastix_tpu.numeric import kernels as K

    dtype = np.dtype(dtype_str)
    rng = np.random.default_rng(0)
    spd = np.eye(T, dtype=dtype) * (T + 1) + rng.standard_normal((T, T)).astype(dtype)
    tiles = jnp.asarray(np.broadcast_to(spd, (batch, T, T)).copy())
    panels = jnp.asarray(rng.standard_normal((batch, T, T)).astype(dtype))
    ga = jnp.asarray(np.arange(batch, dtype=np.int32))

    out = {}
    # each fn returns its full carry so the iterations chain (defeating
    # loop-invariant hoisting) — see _time_fn
    out["potrf"] = KernelTiming(
        "potrf", batch, T,
        _time_fn(lambda t: (K.potrf_batch(jnp.tril(t)),), tiles),
        batch * T**3 / 3.0,
    )
    out["trsm"] = KernelTiming(
        "trsm", batch, T,
        _time_fn(lambda p, t: (K.trsm_llt(p, t), t), panels, tiles),
        batch * float(T) ** 3,
    )
    out["gemm"] = KernelTiming(
        "gemm", batch, T,
        _time_fn(
            lambda p, a, b, d: (K.gemm_scatter(p, a, b, d), a, b, d),
            panels, ga, ga, ga,
        ),
        batch * 2.0 * float(T) ** 3,
    )
    return out


_DISK_CACHE = os.path.join(
    os.path.expanduser(os.environ.get("PASTIX_PERF_CACHE_DIR", "~/.cache")),
    "pastix_tpu_perf.json",
)


def _load_disk() -> dict:
    try:
        with open(_DISK_CACHE) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


def _save_disk(cache: dict) -> None:
    try:
        os.makedirs(os.path.dirname(_DISK_CACHE), exist_ok=True)
        with open(_DISK_CACHE, "w") as f:
            json.dump(cache, f)
    except OSError:
        pass


def calibrate(T: int, dtype_str: str = "float32", force: bool = False) -> dict:
    """Two-point calibration of the task-body kernels on the CURRENT
    backend: per-call overhead + per-item marginal seconds, disk-cached
    per (backend, T, dtype).  This is the measured perf.h: one
    calibration per machine/shape, consumed by the schedule (below) and
    the predicted-vs-measured report."""
    import jax

    key = f"{jax.default_backend()}:{T}:{dtype_str}"
    cache = _load_disk()
    if not force and key in cache:
        return cache[key]
    # big tiles on the CPU fallback: keep the calibration batch small —
    # the serial potrf expander's HBM-equivalent traffic scales with
    # batch * T^2 * T steps and would take tens of seconds at 4096x128^2
    lo, hi = 256, (1024 if T >= 128 else 4096)
    mlo = measure_kernels(T, lo, dtype_str)
    mhi = measure_kernels(T, hi, dtype_str)
    out = {}
    for name in ("potrf", "trsm", "gemm"):
        marg = (mhi[name].seconds - mlo[name].seconds) / (hi - lo)
        marg = max(marg, 1e-12)
        over = max(mlo[name].seconds - lo * marg, 0.0)
        out[name] = {"overhead_s": over, "marginal_s": marg}
    cache[key] = out
    _save_disk(cache)
    return out


def calibrated_thresholds(T: int, dtype_str: str = "float32",
                          waste_factor: float = 4.0) -> dict:
    """Unroll-vs-scan thresholds from the calibration.

    A level is worth its own exact-shape unrolled batch when its padded
    scan waste would cost more device time than ``waste_factor`` per-call
    overheads; below that, the fixed per-level cost dominates and scanning
    (bounded program size) is free.  Clamped so a pathological calibration
    cannot explode compile time (low floor) or program size (high cap)."""
    cal = calibrate(T, dtype_str)
    g, p = cal["gemm"], cal["potrf"]
    unroll_gemm = waste_factor * g["overhead_s"] / g["marginal_s"]
    import jax

    if jax.default_backend() == "tpu" and T % 128 == 0:
        # unrolled levels run the pipelined Pallas E2 (1.67x the XLA
        # gather-GEMM-scatter the scan tails use — BASELINE.md §4e); the
        # kernel differential makes unrolling worth ~4x more E2 work
        # than the padding-vs-overhead model alone says
        unroll_gemm /= 4.0
    unroll_gemm = int(np.clip(unroll_gemm, 512, 8192))
    unroll_diag = int(
        np.clip(waste_factor * p["overhead_s"] / p["marginal_s"], 128, 2048)
    )
    return {"unroll_gemm": unroll_gemm, "unroll_diag": unroll_diag}


def predict_fact_time(layout, dtype_str: str = "float32") -> float:
    """Linear-model factorization wall-time prediction from the cached
    calibration (the blend simulator analog): sum over levels of
    overhead + count * marginal per task-body kernel."""
    cal = calibrate(layout.T, dtype_str)
    total = 0.0
    for lv in layout.levels:
        for name, count in (
            ("potrf", lv.diag.size),
            ("trsm", lv.trsm_panel.size),
            ("gemm", lv.gemm_a.size),
        ):
            if count:
                c = cal[name]
                total += c["overhead_s"] + count * c["marginal_s"]
    return total


def estimate_fact_time(layout, dtype_str: str = "float32") -> float:
    """Predicted factorization wall-time from measured per-level kernel
    rates (the blend cost-model analog, used for schedule decisions and
    speed-of-light fractions)."""
    total = 0.0
    for lv in layout.levels:
        for name, count in (
            ("potrf", lv.diag.size),
            ("trsm", lv.trsm_panel.size),
            ("gemm", lv.gemm_a.size),
        ):
            if count == 0:
                continue
            # bucket batch to the nearest power of two for cache reuse
            b = 1 << max(0, int(np.ceil(np.log2(count))))
            b = min(b, 4096)
            t = measure_kernels(layout.T, b, dtype_str)[name]
            total += t.seconds * (count / t.batch)
    return total


def speed_of_light(layout, measured_seconds: float, peak_gflops: float,
                   kind: str = "llt") -> dict:
    """Roofline summary: achieved device rate vs hardware peak and vs the
    measured-kernel prediction."""
    padded = layout.padded_flops(kind)
    achieved = padded / measured_seconds / 1e9
    return {
        "padded_gflops": achieved,
        "peak_fraction": achieved / peak_gflops if peak_gflops else None,
        "predicted_seconds": None,  # fill via estimate_fact_time if wanted
        "measured_seconds": measured_seconds,
    }
