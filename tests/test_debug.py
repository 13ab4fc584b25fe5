"""Debug validation layer (D3D12 debug-layer analog)."""

import jax.numpy as jnp
import numpy as np
import pytest

from multi_adapter_particles_tpu.config import AppConfig, RenderConfig, SimConfig
from multi_adapter_particles_tpu.models.state import ParticleState
from multi_adapter_particles_tpu.runtime import ParticlesApp
from multi_adapter_particles_tpu.utils import debug as dbg

N = 256


def test_validate_state_accepts_finite():
    st = ParticleState(
        jnp.zeros((4, 128), jnp.float32), jnp.zeros((3, 128), jnp.float32)
    )
    dbg.validate_state(st, where="t")  # must not raise


def test_validate_state_rejects_nan():
    pos = jnp.zeros((4, 128), jnp.float32).at[0, 5].set(jnp.nan)
    st = ParticleState(pos, jnp.zeros((3, 128), jnp.float32))
    with pytest.raises(dbg.DebugValidationError, match="non-finite"):
        dbg.validate_state(st, where="t")


def test_validate_state_ignores_padding():
    # NaN beyond num_particles (the parked padding) must not trip it
    pos = jnp.zeros((4, 128), jnp.float32).at[0, 100].set(jnp.nan)
    st = ParticleState(pos, jnp.zeros((3, 128), jnp.float32))
    dbg.validate_state(st, num_particles=64, where="t")


def test_app_debug_mode_runs_clean():
    app = ParticlesApp(
        AppConfig(num_particles=N, particle_size=10.0),
        SimConfig(num_particles=N),
        RenderConfig(width=256, height=256),
        debug=True,
    )
    for _ in range(3):
        app.draw()  # validation runs every frame; must not raise
    app.shutdown()


def test_handoff_detects_deleted_buffer():
    import jax

    x = jnp.zeros((4, 128), jnp.float32)
    donater = jax.jit(lambda a: a + 1, donate_argnums=(0,))
    donater(x)
    if x.is_deleted():
        with pytest.raises(dbg.DebugValidationError, match="donated"):
            dbg.validate_handoff(x)
