"""Mesh helpers."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(shape=None, axis_names=("dp", "tp"), devices=None) -> Mesh:
    """Build a Mesh over the available devices.

    ``shape=None``: all devices on one ``tp`` axis (dp=1).
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if shape is None:
        shape = (1, n)
    if int(np.prod(shape)) != n:
        raise ValueError(f"mesh shape {shape} != {n} devices")
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, axis_names[: len(shape)])
