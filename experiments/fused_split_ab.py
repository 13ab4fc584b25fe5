"""Controlled A/B: fused single-program frame vs split engines, -novsync.

Round-1 finding (VERDICT weak #4): fused lost to split under dispatch-ahead
pacing (42.6 vs 30.7 ms @262K; 543 vs 412 ms @4M) because donating the
single current state forced XLA to copy it for the stale-by-one render
read. Round 2 gives FusedEngine an explicit two-buffer ping-pong (the
descriptor-base-sliding analog, `Compute.cpp:52-62,1030-1035`): current
state un-donated, previous frame's retired buffers donated as the
integrator's output storage. This script measures both modes both sizes on
the real chip.

Run (background; first dispatch stalls minutes on axon):
    python experiments/fused_split_ab.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench_mode(n: int, fused: bool, warm: int, timed: int) -> float:
    from multi_adapter_particles_tpu.config import (
        AppConfig, RenderConfig, SimConfig,
    )
    from multi_adapter_particles_tpu.runtime.orchestrator import ParticlesApp
    from multi_adapter_particles_tpu.utils.timers import sync

    app = ParticlesApp(
        AppConfig(num_particles=n, vsync=False, gui=False),
        SimConfig(num_particles=n),
        RenderConfig(),  # 1024x1024, matches the round-1 A/B
        seed=42,
        fused=fused,
        async_timers=False,
    )

    def drain():
        app.compute.wait_for_gpu()
        lf = app.render.last_frame
        if lf is not None and not lf.is_deleted():
            sync(lf)

    for _ in range(warm):
        app.draw()
    drain()
    t0 = time.perf_counter()
    for _ in range(timed):
        app.draw()
    drain()
    ms = (time.perf_counter() - t0) * 1000.0 / timed
    app.shutdown()
    return ms


def main() -> int:
    import jax

    print(f"backend={jax.default_backend()}", flush=True)
    for n, warm, timed in ((262_144, 10, 30), (4_194_304, 3, 10)):
        for fused in (False, True):
            label = "fused" if fused else "split"
            t0 = time.perf_counter()
            ms = bench_mode(n, fused, warm, timed)
            print(
                f"N={n:>8} {label}: {ms:8.2f} ms/frame "
                f"(wall {time.perf_counter() - t0:.0f}s)",
                flush=True,
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
