"""Device-mesh helpers."""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(mesh_shape=None, axis_names=("data",), devices=None) -> Mesh:
    """Build a Mesh over the available devices.

    mesh_shape None/empty -> 1D mesh over all devices on axis `data`.
    ``devices`` overrides the device list — multi-process data-parallel
    runs must pass ``jax.local_devices()`` (the global ``jax.devices()``
    list is process-0-first, so processes > 0 would otherwise build a mesh
    of non-addressable remote chips and fail at the first device_put).
    """
    devices = np.asarray(devices if devices is not None else jax.devices())
    if not mesh_shape:
        mesh_shape = (len(devices),)
    n = int(np.prod(mesh_shape))
    if n > len(devices):
        raise ValueError(f"mesh {mesh_shape} needs {n} devices, "
                         f"have {len(devices)}")
    dev = devices[:n].reshape(mesh_shape)
    return Mesh(dev, axis_names[:len(mesh_shape)])


def single_device_mesh() -> Mesh:
    return Mesh(np.asarray(jax.devices()[:1]), ("data",))
