"""Mesh construction helpers."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def data_mesh(num_devices: int | None = None) -> Mesh:
    """1-D mesh over the first `num_devices` devices, axis name 'data'.

    Collectives ride ICI on real TPU slices; on CPU the same program runs
    over `--xla_force_host_platform_device_count` virtual devices, which is
    how tests and the driver's dry-run validate the sharded path without
    hardware (SURVEY.md §4 item 4)."""
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), ("data",))
