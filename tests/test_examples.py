"""Run the example scripts as integration tests — exactly the reference's
testing model (examples ARE the test suite, SURVEY.md section 4 point 1)."""

import os
import subprocess
import sys

import pytest

_EX = os.path.join(os.path.dirname(__file__), "..", "examples")

_ENV = dict(
    os.environ,
    JAX_PLATFORMS="cpu",
    XLA_FLAGS=os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8",
)


def _run(script, *args):
    # in-process platform pin: examples import pastix_tpu which imports jax
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu');"
        "jax.config.update('jax_enable_x64', True);"
        f"import sys; sys.argv = ['x', *{list(args)!r}];"
        f"exec(open({os.path.join(_EX, script)!r}).read())"
    )
    r = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        env=_ENV, timeout=600,
    )
    assert r.returncode in (0, None), f"{script} failed:\n{r.stdout}\n{r.stderr}"
    return r.stdout


def test_simple():
    out = _run("simple.py", "-lap", "24")
    assert "residual" in out


def test_step_by_step():
    out = _run("step_by_step.py")
    assert "reuse step 2" in out


def test_schur():
    out = _run("schur.py")
    assert "solve-with-schur residual" in out


def test_reentrant():
    out = _run("reentrant.py")
    assert "llt-2d" in out and "ldlt-3d" in out


def test_murge_assembly():
    out = _run("murge_assembly.py")
    assert "assembled n=200" in out


def test_isolate_zeros():
    out = _run("isolate_zeros.py")
    assert "isolate-zeros residual" in out


def test_simple_dist():
    out = _run("simple_dist.py")
    assert "max error" in out


def test_memory_usage():
    out = _run("memory_usage.py", "-lap3", "12")
    assert "device factor pool" in out and "residual" in out


def test_multi_device():
    out = _run("multi_device.py")
    assert "pool sharded" in out and "residual" in out


def test_out_of_core():
    out = _run("out_of_core.py")
    assert "segments under" in out and "residual" in out
