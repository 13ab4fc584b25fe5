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

Run DETACHED (`quick` = the off/on pair only):
  nohup python experiments/fused_marker_ab.py > /tmp/fused_marker_ab.log 2>&1 &

RESULTS (on-chip v5e, 2026-08-20, 4-leg attribution at the ORIGINAL
4-frames-every-64 profiler cadence):

  profiler=off marker=off    8.27 ms   (bench's fused configuration)
  profiler=on  marker=on    11.66 ms   (+3.39, the old GUI default)
  profiler=on  marker=off   10.95 ms   -> profiler windows alone +2.68
  profiler=off marker=on     8.91 ms   -> barrier/marker alone  +0.63

The barrier that buys reference-parity simulate/render rows in fused
mode is cheap (+7.6%); the expensive part was the async profiler TRACE
WINDOW (~160 ms per 4-frame window over the tunnel — no host stall,
but real device+transport time). Landed: default cadence 2 frames
every 128 (gputimer.py) cuts the amortized profiler cost ~4.5x.
Re-measured after the change (quick legs, same windows): ON 7.97 vs
OFF 8.87 ms — the GUI-default overhead is now inside tunnel noise
(the stage rows still populate from the early first window + EMA);
`-timerwindow` tightens the cadence when a run wants fresher rows.
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
    quick = "quick" in sys.argv[1:]
    off = bench_fused(False)
    on = bench_fused(True)
    print(f"combined cost: {on - off:+.2f} ms "
          f"({(on / off - 1) * 100:+.1f}%)", flush=True)
    if not quick:
        prof_only = bench_fused(True, force_markers=False)
        marker_only = bench_fused(False, force_markers=True)
        print(f"profiler-window cost alone: {prof_only - off:+.2f} ms; "
              f"barrier/marker cost alone: {marker_only - off:+.2f} ms",
              flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
