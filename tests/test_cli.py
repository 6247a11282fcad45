"""CLI driver (reference get_options.c flag vocabulary + simple.c /
step-by-step.c behavior — SURVEY.md §2 row 21)."""

import numpy as np
import pytest

from pastix_tpu.cli import main


def test_cli_lap_smoke(capsys):
    assert main(["-lap", "16", "-q"]) == 0
    out = capsys.readouterr().out
    assert "residual" in out


def test_cli_lap3_ldlt_steps(capsys):
    assert main(["-lap3", "8", "--fact", "ldlt", "--steps", "-q"]) == 0


def test_cli_mesh_flag():
    assert main(["-lap3", "8", "--mesh", "2x4", "-q"]) == 0


def test_cli_ooc_flag():
    assert main(["-lap3", "10", "--ooc", "1", "-q"]) == 0


def test_cli_unsym_defaults_to_lu(capsys, tmp_path):
    import scipy.io as sio

    from pastix_tpu.generators import random_unsym

    A = random_unsym(120, density=0.05, seed=2)
    f = tmp_path / "m.mtx"
    sio.mmwrite(str(f), A.to_scipy())
    assert main(["-mm", str(f), "-q"]) == 0
