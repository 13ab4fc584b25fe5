"""Mesh construction helpers.

One logical axis, `"particles"`: the only scalable dimension in this workload
(SURVEY §2.2 — there is no sequence/batch/expert axis). The mesh is 1-D so
`ppermute` rides neighbor ICI links; multi-slice (DCN) layouts would add an
outer axis, with the ring kept inside each slice.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXIS = "particles"


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    n_devices: Optional[int] = None,
) -> Mesh:
    """1-D mesh over the given devices (default: all addressable)."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (AXIS,))


def mesh_devices(mesh: Mesh):
    return list(mesh.devices.ravel())


def particle_sharding(mesh: Mesh) -> NamedSharding:
    """SoA planes [C, Np] sharded along the particle (lane) axis."""
    return NamedSharding(mesh, P(None, AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
