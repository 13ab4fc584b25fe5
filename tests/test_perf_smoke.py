"""Performance smoke tests — the BASELINE.json interactions/sec oracle.

These run ONLY on a real TPU backend (the CI suite forces CPU, where the
numbers are meaningless); the driver's bench.py is the canonical record.

Thresholds sit at ~1.5x of the BENCH_r04 anchors (VERDICT r4 #9 — the
old 2-6x-loose gates only caught catastrophic regressions): a real TPU
run of the suite now catches 1.5x slowdowns while riding out normal
tunnel variance. Timed windows use enough reps that the ~35 ms axon
sync round-trip (one per window, see utils.timers.sync) stays a small
fraction of the measurement.

BENCH_r04 anchors on v5e (2026-08-19): all-pairs rect 0.192 /
halfpair 0.216 Tpairs/s @1M; exact 1024x1024 render 7.9 ms @262K and
83.2 ms @4M; pm_grid 4M G=128 152.8 ms/step.
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
@pytest.mark.parametrize("half,floor_tpairs", [
    # rect (the bit-stable default): 0.192 measured @1M; the 131K window
    # runs a touch lower (0.172-0.185 across rounds) -> 1.5x gate ~0.12
    (False, 0.12),
    # halfpair (the round-4 Newton-3rd schedule): 0.216 measured @1M
    (True, 0.135),
])
def test_allpairs_interactions_per_second(half, floor_tpairs):
    import jax

    from multi_adapter_particles_tpu.config import SimConfig
    from multi_adapter_particles_tpu.models import init as pinit, integrator
    from multi_adapter_particles_tpu.ops import allpairs

    assert jax.default_backend() == "tpu"
    n = 131072
    cfg = SimConfig(num_particles=n, force_model="all_pairs",
                    all_pairs_half=half)
    accel = allpairs.make_accel_fn(
        mass=cfg.mass, softening_squared=cfg.softening_squared, half=half
    )
    step = integrator.make_step(cfg, accel_fn=accel)
    state = pinit.initialize_particles_device(n, seed=0)
    state = step(state)
    _sync(state.position)
    t0 = time.perf_counter()
    for _ in range(5):
        state = step(state)
    _sync(state.position)
    rate = 5 * n * n / (time.perf_counter() - t0)
    kernel = "halfpair" if half else "rect"
    assert rate > floor_tpairs * 1e12, (
        f"{kernel} {rate/1e12:.3f} Tpairs/s < {floor_tpairs} floor "
        "(1.5x gate on BENCH_r04)"
    )


@requires_tpu
def test_render_frame_time():
    """Exact 1024x1024 render @262K: BENCH_r04 = 7.9 ms; 10 reps put the
    one sync RTT at ~3.5 ms/frame -> expect ~11-12 wall, gate at 16."""
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
    for _ in range(10):
        out = r.render_arrays(state.position, cam, 2.5, 0.15)
    _sync(out.frame)
    ms = (time.perf_counter() - t0) / 10 * 1e3
    assert ms < 16.0, f"render {ms:.1f} ms > 16 ms gate (BENCH_r04: 7.9)"


@requires_tpu
def test_render_4m_frame_time():
    """The reference-default N: 4M exact render, BENCH_r04 = 83.2 ms
    (1M-chunked fold + dead-tail skip + merge starts + MXU cgb + vb=256
    are the wins this protects); 1.5x gate at 125."""
    from multi_adapter_particles_tpu.config import RenderConfig
    from multi_adapter_particles_tpu.models import init as pinit
    from multi_adapter_particles_tpu.render.camera import Camera
    from multi_adapter_particles_tpu.render.renderer import Renderer

    n = 4_194_304
    state = pinit.initialize_particles_device(n, seed=0)
    _sync(state.position)
    r = Renderer(RenderConfig())
    cam = Camera()
    out = r.render_arrays(state.position, cam, 2.5, 0.15)
    _sync(out.frame)
    t0 = time.perf_counter()
    for _ in range(4):
        out = r.render_arrays(state.position, cam, 2.5, 0.15)
    _sync(out.frame)
    ms = (time.perf_counter() - t0) / 4 * 1e3
    assert ms < 125.0, f"render-4m {ms:.1f} ms > 125 ms gate (BENCH_r04: 83.2)"


@requires_tpu
def test_pm_step_time():
    """pm_grid 4M G=128 regression gate: BENCH_r04 = 152.8 ms (round-1
    shipped 553; the searchsorted replacement and the lane-packed
    gathers are the wins this protects); 1.5x gate at 230."""
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
    assert ms < 230.0, f"pm step {ms:.1f} ms > 230 ms gate (BENCH_r04: 152.8)"


@requires_tpu
def test_tree_accel_time():
    """Tree-P3M accel @262K demo, G=128: full-bench 2026-08-21 = 97.7 ms
    (the Newton-3rd halved sweep default; directed was 105.7 — the
    halved landing and the round-3/4 sweep chain are the wins this
    protects); ~1.5x gate at 150."""
    import numpy as np

    from multi_adapter_particles_tpu.models import init as pinit
    from multi_adapter_particles_tpu.ops import p3m
    from multi_adapter_particles_tpu.ops.treeforce import host_pair_budget

    n, grid, box = 262_144, 128, 2048.0
    state = pinit.initialize_particles_device(n, seed=42)
    _sync(state.position)
    pos = state.position
    r_c = 6.75 * box / grid
    gn = max(int(box // r_c), 1)
    budget = host_pair_budget(np.asarray(pos), box, r_c, gn)

    def accel():
        return p3m.p3m_accel_with_overflow(
            pos, grid=grid, box=box, g_const=70000.0 / n,
            softening_squared=25.0, near_mode="tree", pair_budget=budget,
            half_force=True,
        )

    acc, dropped = accel()
    _sync(acc)
    assert int(dropped) == 0
    t0 = time.perf_counter()
    for _ in range(3):
        acc, _ = accel()
    _sync(acc)
    ms = (time.perf_counter() - t0) / 3 * 1e3
    assert ms < 150.0, f"tree accel {ms:.1f} ms > 150 ms gate (bench: 97.7)"
