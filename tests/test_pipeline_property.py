"""Property test: the frame pipeline never perturbs the simulation.

The reference's correctness argument is its fence protocol: whatever the
render/copy queues do, the simulation stream is a pure function of its
initial state (`Render.cpp:38-85`). Here the analog invariant: ANY
interleaving of pipeline operations — draws, draw-toggles, adapter
re-assignments, mesh rescales, extension toggles, snapshot/restore-free
frames — leaves the trajectory identical to an uninterrupted bare
integrator run with the same step count.

Randomized op sequences (seeded) drive the orchestrator; after each
sequence the positions must match the reference trajectory.
"""

import random

import jax
import numpy as np
import pytest

from multi_adapter_particles_tpu.config import AppConfig, RenderConfig, SimConfig
from multi_adapter_particles_tpu.models import init as pinit, integrator
from multi_adapter_particles_tpu.runtime import ParticlesApp

N = 512


def reference_positions(num_steps: int) -> np.ndarray:
    cfg = SimConfig(num_particles=N)
    step = integrator.make_step(cfg, donate=False)
    s = pinit.initialize_particles_device(N, seed=0)
    for _ in range(num_steps):
        s = step(s)
    return np.asarray(s.position)


@pytest.mark.parametrize("seq_seed", [1, 2, 3])
def test_random_pipeline_ops_do_not_perturb_sim(seq_seed):
    rng = random.Random(seq_seed)
    app = ParticlesApp(
        AppConfig(num_particles=N, particle_size=10.0),
        SimConfig(num_particles=N),
        RenderConfig(width=256, height=256),
        seed=0,
    )
    n_devices = len(jax.devices())
    steps = 0
    for _ in range(12):
        op = rng.choice(
            ["draw", "draw", "draw", "toggle", "reassign", "mesh", "ext"]
        )
        if op == "draw":
            app.draw()
            steps += 1
        elif op == "toggle":
            app.draw_enabled = not app.draw_enabled
        elif op == "reassign" and n_devices > 1 and app.mesh_devices <= 1:
            app.set_compute_adapter(
                rng.randrange(n_devices)
            )
            app.draw()  # reconfiguration applies post-present
            steps += 1
        elif op == "mesh" and n_devices >= 4:
            app.set_mesh_devices(rng.choice([1, 2, 4]))
        elif op == "ext":
            app.app.use_queue_extension = not app.app.use_queue_extension
    app.compute.wait_for_gpu()
    got = np.asarray(app.compute.positions)
    want = reference_positions(steps)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-3)
    app.shutdown()
