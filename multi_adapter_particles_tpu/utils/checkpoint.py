"""Checkpoint / resume: host-side snapshot of the state pytree to disk.

The reference has no disk persistence; its in-memory state hand-off across
device generations (`Compute::CopyState`, `Compute.cpp:303-410`) is the
analog. SURVEY §5 asks for the generalization: snapshot/restore of the
particle state (plus step counter) so long runs survive process restarts.

Format: a single .npz with positions [4, Np], velocities [3, Np], and
metadata (step, num_particles, version). Atomic write (tmp + rename).
"""

from __future__ import annotations

import os
import tempfile
from typing import Optional, Tuple

import jax
import numpy as np

from multi_adapter_particles_tpu.models.state import ParticleState

FORMAT_VERSION = 1


def save_checkpoint(
    path: str,
    state: ParticleState,
    step: int,
    num_particles: Optional[int] = None,
) -> None:
    """Write state + step atomically. Blocks until the state is readable."""
    pos = np.asarray(jax.device_get(state.position))
    vel = np.asarray(jax.device_get(state.velocity))
    d = os.path.dirname(os.path.abspath(path)) or "."
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(
                f,
                position=pos,
                velocity=vel,
                step=np.int64(step),
                num_particles=np.int64(
                    num_particles if num_particles is not None else pos.shape[1]
                ),
                version=np.int64(FORMAT_VERSION),
            )
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def load_checkpoint(path: str) -> Tuple[ParticleState, int, int]:
    """-> (state on default device, step, num_particles)."""
    with np.load(path) as z:
        version = int(z["version"])
        if version > FORMAT_VERSION:
            raise ValueError(f"checkpoint version {version} too new")
        import jax.numpy as jnp

        state = ParticleState(
            jnp.asarray(z["position"]), jnp.asarray(z["velocity"])
        )
        return state, int(z["step"]), int(z["num_particles"])
