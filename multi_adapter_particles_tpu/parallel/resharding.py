"""Elastic re-sharding: move live particle state between device layouts.

The reference's live adapter re-assignment (`Particles.cpp:458-537` +
`Compute::CopyState`, `Compute.cpp:303-410`) generalized: drain, then
re-place the state pytree onto a new mesh / device with `jax.device_put`
(XLA plans the all-to-all; no 3-hop velocity smuggling needed because every
array is transferable, unlike the reference's position-only shared heap).

Trajectory continuity is bitwise: re-sharding moves bits, it never
recomputes them (tested in tests/test_parallel.py).
"""

from __future__ import annotations

from typing import Union

import jax
from jax.sharding import Mesh

from multi_adapter_particles_tpu.models.state import ParticleState
from multi_adapter_particles_tpu.parallel.mesh import particle_sharding


def reshard_state(
    state: ParticleState,
    target: Union[Mesh, jax.Device],
) -> ParticleState:
    """Re-place state onto a new mesh (particle-sharded) or single device."""
    if isinstance(target, Mesh):
        sh = particle_sharding(target)
    else:
        sh = target
    return ParticleState(
        jax.device_put(state.position, sh),
        jax.device_put(state.velocity, sh),
    )
