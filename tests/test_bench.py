"""The benchmark measurement protocol itself (VERDICT r2 missing #1:
a result the driver cannot capture is an unverified claim).  Runs the
real bench.py on CPU at a tiny size and checks the contract: exactly one
JSON line on stdout, with the required fields, inside a tight budget."""

import json
import os
import subprocess
import sys


def test_bench_emits_contract_json():
    env = dict(
        os.environ,
        PASTIX_BENCH_FORCE_CPU="1",
        PASTIX_BENCH_NX="10",
        PASTIX_BENCH_BUDGET_S="240",
        PASTIX_BENCH_REPS="1",
    )
    root = os.path.join(os.path.dirname(__file__), "..")
    r = subprocess.run(
        [sys.executable, os.path.join(root, "bench.py")],
        capture_output=True, text=True, timeout=300, env=env, cwd=root,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [l for l in r.stdout.splitlines() if l.startswith("{")]
    assert len(lines) == 1, r.stdout
    rec = json.loads(lines[0])
    assert rec["metric"] == "fact_gflops"
    assert rec["unit"] == "GFLOP/s"
    assert rec["value"] > 0
    assert "vs_baseline" in rec and "fact_ms" in rec
    assert "padded_over_useful" in rec and "nnz_l_per_s" in rec
