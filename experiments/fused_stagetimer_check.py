"""On-chip validation of the fused per-stage timer (VERDICT r4 #6).

Runs the fused frame loop with the stage timer + markers on, forces an
early trace window, and prints the parsed stage rows. Pass criteria:
both "simulate" and "render" rows appear, their sum is close to the
"frame" row (the fused module total), and the split is plausible
(central-well sim is a tiny fraction of the frame).

Run DETACHED:
  nohup python experiments/fused_stagetimer_check.py > /tmp/fused_stagetimer.log 2>&1 &
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def main():
    from multi_adapter_particles_tpu.config import (
        AppConfig, RenderConfig, SimConfig,
    )
    from multi_adapter_particles_tpu.runtime.orchestrator import ParticlesApp

    n = 262_144
    print(f"backend={jax.default_backend()} n={n}", flush=True)
    app = ParticlesApp(
        AppConfig(num_particles=n, vsync=False, gui=False),
        SimConfig(num_particles=n),
        RenderConfig(width=1280, height=720),
        seed=42, fused=True, async_timers=True,
    )
    assert app.fused_engine.stage_markers
    app.stage_timer.window_every = 16
    app.stage_timer.window_frames = 4
    t0 = time.perf_counter()
    for _ in range(40):
        app.draw()
    app.compute.wait_for_gpu()
    app.stage_timer.flush()
    print(f"40 frames in {time.perf_counter()-t0:.1f}s; "
          f"windows parsed: {app.stage_timer.windows_parsed}", flush=True)
    stages = {k: v.milliseconds for k, v in app.metrics.stages.items()}
    print("stages_ms:", stages, flush=True)
    ok = (
        "simulate" in stages and "render" in stages and "frame" in stages
        and stages["render"] > stages["simulate"] > 0
        and abs(stages["simulate"] + stages["render"] - stages["frame"])
        < 0.5 * stages["frame"]
    )
    print("PASS" if ok else "CHECK FAILED", flush=True)
    app.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
