"""Level grouping: unrolled heads + scanned tails.

The level-set schedule has a few flop-heavy levels (the wide bottom of the
elimination tree) and a long tail of small levels (separator block-column
chains: one level per tile column on the near-dense top separators).
Unrolling every level into the jitted program would make compile time and
program size scale with tree depth (hundreds of levels at 3D scale), so:

  * big levels are unrolled (distinct batch shapes, maximal MXU batches);
  * consecutive small levels are bucketed by size class and executed with
    one ``lax.scan`` per bucket over stacked, padded index tables.

Padding uses JAX's documented out-of-bounds semantics: gather indices clamp
(reads junk that is then discarded), scatter indices drop (padded writes are
no-ops) — so padded entries need no masks and touch no real tiles.
"""

from __future__ import annotations

import dataclasses
import os

import numpy as np

from pastix_tpu.analyze.layout import LevelTables

# pool-indexed fields padded with an OOB pool index; col-indexed with OOB nbc
_POOL_FIELDS = ("diag", "trsm_panel", "trsm_diag", "gemm_a", "gemm_b", "gemm_d")
_COL_FIELDS = ("cols", "trsm_row", "trsm_col", "gemm_k")


@dataclasses.dataclass
class ScanGroup:
    """Stacked tables for a run of same-bucket levels: each field is
    (n_levels, padded_len) int32."""

    n_levels: int
    cols: np.ndarray
    diag: np.ndarray
    trsm_panel: np.ndarray
    trsm_diag: np.ndarray
    trsm_row: np.ndarray
    trsm_col: np.ndarray
    gemm_a: np.ndarray
    gemm_b: np.ndarray
    gemm_d: np.ndarray
    gemm_k: np.ndarray
    gemm_d_offdiag: np.ndarray  # gemm_d with diagonal targets sent OOB (LU)


def _pad_to(a: np.ndarray, m: int, fill: int) -> np.ndarray:
    out = np.full(m, fill, dtype=np.int32)
    out[: a.size] = a
    return out


def _stack_levels(levels: list[LevelTables], npool: int, nbc: int) -> ScanGroup:
    md = max(lv.diag.size for lv in levels)
    mt = max((lv.trsm_panel.size for lv in levels), default=0)
    mg = max((lv.gemm_a.size for lv in levels), default=0)
    mt = max(mt, 1)
    mg = max(mg, 1)
    md = max(md, 1)

    def stack(field, m, fill):
        return np.stack([_pad_to(getattr(lv, field), m, fill) for lv in levels])

    gd_off = []
    for lv in levels:
        g = _pad_to(lv.gemm_d, mg, npool)
        nd = np.zeros(mg, dtype=bool)
        nd[: lv.gemm_nondiag.size] = lv.gemm_nondiag
        gd_off.append(np.where(nd, g, npool).astype(np.int32))

    return ScanGroup(
        n_levels=len(levels),
        cols=stack("cols", md, nbc),
        diag=stack("diag", md, npool),
        trsm_panel=stack("trsm_panel", mt, npool),
        trsm_diag=stack("trsm_diag", mt, npool),
        trsm_row=stack("trsm_row", mt, nbc),
        trsm_col=stack("trsm_col", mt, nbc),
        gemm_a=stack("gemm_a", mg, npool),
        gemm_b=stack("gemm_b", mg, npool),
        gemm_d=stack("gemm_d", mg, npool),
        gemm_k=stack("gemm_k", mg, nbc),
        gemm_d_offdiag=np.stack(gd_off),
    )


# Threshold fallbacks (env-overridable for experiments).  unroll_gemm=2048:
# scan groups pad every level to the widest in the run, and the mid-size
# levels (2k-5k GEMMs) measured ~30% padded-triple waste when scanned --
# unrolling them costs program size but no wasted MXU work.  Scan buckets
# grow 2x so the remaining small-level runs stay tightly packed.
_UNROLL_GEMM = int(os.environ.get("PASTIX_UNROLL_GEMM", "2048"))
_UNROLL_DIAG = int(os.environ.get("PASTIX_UNROLL_DIAG", "512"))
_BUCKET_GROWTH = int(os.environ.get("PASTIX_SCAN_BUCKET_GROWTH", "1"))


def resolve_thresholds(T: int | None = None, dtype_str: str = "float32"):
    """(unroll_gemm, unroll_diag) for the CURRENT backend.

    Precedence: explicit env overrides > the measured perf-model
    calibration (perf.calibrated_thresholds — the reference's blend
    consumes its machine model the same way, SURVEY.md §2 rows 7-8) >
    the static fallbacks.  PASTIX_MEASURED_PLAN=0 disables measurement."""
    env_g = os.environ.get("PASTIX_UNROLL_GEMM")
    env_d = os.environ.get("PASTIX_UNROLL_DIAG")
    if env_g is not None or env_d is not None:
        return (
            int(env_g) if env_g is not None else _UNROLL_GEMM,
            int(env_d) if env_d is not None else _UNROLL_DIAG,
        )
    if T is not None and os.environ.get("PASTIX_MEASURED_PLAN", "1") != "0":
        try:
            from pastix_tpu.perf import calibrated_thresholds

            th = calibrated_thresholds(T, dtype_str)
            return th["unroll_gemm"], th["unroll_diag"]
        except Exception:
            pass  # no device / measurement failure: static fallbacks
    return _UNROLL_GEMM, _UNROLL_DIAG


def group_plan(
    levels: list[LevelTables],
    unroll_gemm: int | None = None,
    unroll_diag: int | None = None,
    bucket_base: int = 128,
    T: int | None = None,
):
    """Partition level indices: list of ("unroll", i) / ("scan", [i, ...])
    entries, preserving level order.  Shared by the single-device and
    sharded table builders.  With ``T`` (and no explicit thresholds), the
    unroll/scan cut comes from the measured perf calibration for the
    current backend (resolve_thresholds)."""
    if unroll_gemm is None and unroll_diag is None:
        unroll_gemm, unroll_diag = resolve_thresholds(T)
    if unroll_gemm is None:
        unroll_gemm = _UNROLL_GEMM
    if unroll_diag is None:
        unroll_diag = _UNROLL_DIAG
    plan = []
    run: list[int] = []
    run_bucket = None

    def bucket_of(lv: LevelTables) -> int:
        size = max(int(lv.gemm_a.size), int(lv.trsm_panel.size), 1)
        b = 0
        while size > bucket_base << (_BUCKET_GROWTH * b):
            b += 1
        return b

    def flush():
        nonlocal run, run_bucket
        if run:
            if len(run) == 1:
                plan.append(("unroll", run[0]))
            else:
                plan.append(("scan", list(run)))
        run, run_bucket = [], None

    for i, lv in enumerate(levels):
        if lv.gemm_a.size >= unroll_gemm or lv.diag.size >= unroll_diag:
            flush()
            plan.append(("unroll", i))
            continue
        b = bucket_of(lv)
        if run_bucket is not None and b != run_bucket:
            flush()
        run.append(i)
        run_bucket = b
    flush()
    return plan


def group_levels(
    levels: list[LevelTables],
    npool: int,
    nbc: int,
    unroll_gemm: int | None = None,
    unroll_diag: int | None = None,
    bucket_base: int = 128,
):
    """Return an execution plan: list of ("unroll", LevelTables) and
    ("scan", ScanGroup) entries, preserving level order."""
    plan = []
    for tag, item in group_plan(levels, unroll_gemm, unroll_diag, bucket_base):
        if tag == "unroll":
            plan.append(("unroll", levels[item]))
        else:
            plan.append(("scan", _stack_levels([levels[i] for i in item], npool, nbc)))
    return plan
