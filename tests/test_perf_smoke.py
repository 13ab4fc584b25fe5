"""Performance smoke tests — the BASELINE.json interactions/sec oracle.

These run ONLY on a real TPU backend (the CI suite forces CPU, where the
numbers are meaningless); the driver's bench.py is the canonical record.
Thresholds are deliberately loose (~half of measured) so regressions of
2x+ fail while normal variance passes.

Measured anchors on v5e (2026-08-17): all-pairs 0.185 Tpairs/s @1M;
central-well ~1 ms/step @256K (dispatch-bound over the tunnel); exact
1024x1024 render 19-21 ms @262K; pm_grid 4M G=128 152.5 ms.
"""

import os
import time

import pytest


def _on_tpu() -> bool:
    import jax

    return jax.default_backend() == "tpu"


# Auto-enabled whenever the live backend is TPU (run the suite with
# MAP_TEST_BACKEND=tpu — conftest then skips the CPU forcing); the legacy
# MAP_PERF_SMOKE=1 override still forces them on.
requires_tpu = pytest.mark.skipif(
    os.environ.get("MAP_PERF_SMOKE") != "1" and not _on_tpu(),
    reason="perf smoke needs the TPU backend (MAP_TEST_BACKEND=tpu)",
)


def _sync(x):
    import jax

    float(jax.device_get(x.ravel()[0]))


@requires_tpu
def test_allpairs_interactions_per_second():
    import jax

    from multi_adapter_particles_tpu.config import SimConfig
    from multi_adapter_particles_tpu.models import init as pinit, integrator
    from multi_adapter_particles_tpu.ops import allpairs

    assert jax.default_backend() == "tpu"
    n = 131072
    cfg = SimConfig(num_particles=n, force_model="all_pairs")
    accel = allpairs.make_accel_fn(
        mass=cfg.mass, softening_squared=cfg.softening_squared
    )
    step = integrator.make_step(cfg, accel_fn=accel)
    state = pinit.initialize_particles_device(n, seed=0)
    state = step(state)
    _sync(state.position)
    t0 = time.perf_counter()
    for _ in range(3):
        state = step(state)
    _sync(state.position)
    rate = 3 * n * n / (time.perf_counter() - t0)
    assert rate > 0.08e12, f"{rate/1e12:.3f} Tpairs/s < 0.08 floor"


@requires_tpu
def test_render_frame_time():
    import jax

    from multi_adapter_particles_tpu.config import RenderConfig
    from multi_adapter_particles_tpu.models import init as pinit
    from multi_adapter_particles_tpu.render.camera import Camera
    from multi_adapter_particles_tpu.render.renderer import Renderer

    n = 262144
    state = pinit.initialize_particles_device(n, seed=0)
    _sync(state.position)
    r = Renderer(RenderConfig())
    cam = Camera()
    out = r.render_arrays(state.position, cam, 2.5, 0.15)
    _sync(out.frame)
    t0 = time.perf_counter()
    for _ in range(3):
        out = r.render_arrays(state.position, cam, 2.5, 0.15)
    _sync(out.frame)
    ms = (time.perf_counter() - t0) / 3 * 1e3
    assert ms < 50.0, f"render {ms:.1f} ms > 50 ms ceiling (measured 19-21)"


@requires_tpu
def test_pm_step_time():
    """pm_grid 4M G=128 regression gate: 2x headroom over the measured
    152.5 ms (round-1 shipped 553; the searchsorted replacement and the
    lane-packed gathers are the wins this protects)."""
    import jax

    from multi_adapter_particles_tpu.config import SimConfig
    from multi_adapter_particles_tpu.models import init as pinit, integrator

    n = 4_194_304
    cfg = SimConfig(num_particles=n, force_model="pm_grid",
                    pm_grid_size=128, interaction_scale=1.0 / n)
    step = integrator.make_step(cfg)
    state = pinit.initialize_particles_device(n, seed=0)
    state = step(state)
    _sync(state.position)
    t0 = time.perf_counter()
    for _ in range(3):
        state = step(state)
    _sync(state.position)
    ms = (time.perf_counter() - t0) / 3 * 1e3
    assert ms < 300.0, f"pm step {ms:.1f} ms > 300 ms ceiling (measured 152)"
