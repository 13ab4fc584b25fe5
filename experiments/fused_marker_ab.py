"""Fused-mode stage-marker cost A/B (round-5 review finding #3).

The round-5 fused per-stage timer plants a bitwise-inert marker +
optimization_barrier between the sim and render halves of the one fused
program (runtime/fused.py stage_markers) so ProfilerStageTimer can split
the module's op stream into the reference's "simulate ms"/"render ms"
rows (`/root/reference/Particles/Compute.cpp:445-446`,
`Render.cpp:151-152`). The barrier also pins every sim op after every
render op — potentially trading away cross-stage XLA scheduling, which
is fused mode's stated advantage. bench.py's fused stages run with
async_timers=False (markers off), so the recorded numbers would hide a
marker cost paid by the default GUI fused run (async_timers=None ->
gui and not debug -> True).

This harness measures the fused frame loop @262K/720p with markers off
vs on, same windows as bench (warm 30 / timed 60, transport-aware
pacing converged).

Run DETACHED:
  nohup python experiments/fused_marker_ab.py > /tmp/fused_marker_ab.log 2>&1 &
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = 262_144
WARM, TIMED = 30, 60


def bench_fused(async_timers: bool, force_markers=None) -> float:
    import jax  # noqa: F401

    from multi_adapter_particles_tpu.config import (
        AppConfig, RenderConfig, SimConfig,
    )
    from multi_adapter_particles_tpu.runtime.orchestrator import ParticlesApp
    from multi_adapter_particles_tpu.utils.timers import sync

    app = ParticlesApp(
        AppConfig(num_particles=N, vsync=False, gui=False),
        SimConfig(num_particles=N),
        RenderConfig(width=1280, height=720),
        seed=42,
        fused=True,
        async_timers=async_timers,
    )
    assert app.compute.stage_markers == async_timers, (
        "markers should track the async stage timer"
    )
    if force_markers is not None:
        # stage_markers is read at TRACE time (first draw compiles the
        # program) — flipping it here cleanly separates the barrier
        # cost from the async profiler-window cost
        app.compute.stage_markers = force_markers

    def drain():
        app.compute.wait_for_gpu()
        if app.render.last_frame is not None:
            sync(app.render.last_frame)

    for _ in range(WARM):
        app.draw()
    drain()
    t0 = time.perf_counter()
    for _ in range(TIMED):
        app.draw()
    drain()
    ms = (time.perf_counter() - t0) * 1000.0 / TIMED
    stages = {
        k: round(t.ema_seconds * 1000.0, 3)
        for k, t in app.metrics.stages.items()
    }
    app.shutdown()
    markers = (
        async_timers if force_markers is None else force_markers
    )
    label = (f"profiler={'on ' if async_timers else 'off'} "
             f"marker={'on ' if markers else 'off'}")
    print(f"{label} fused frame @262K/720p: {ms:7.2f} ms  stages={stages}",
          flush=True)
    return ms


def main():
    import jax

    from multi_adapter_particles_tpu.utils import compilecache

    compilecache.enable("auto")
    print(f"backend={jax.default_backend()}", flush=True)
    off = bench_fused(False)
    on = bench_fused(True)
    print(f"combined cost: {on - off:+.2f} ms "
          f"({(on / off - 1) * 100:+.1f}%)", flush=True)
    prof_only = bench_fused(True, force_markers=False)
    marker_only = bench_fused(False, force_markers=True)
    print(f"profiler-window cost alone: {prof_only - off:+.2f} ms; "
          f"barrier/marker cost alone: {marker_only - off:+.2f} ms",
          flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
