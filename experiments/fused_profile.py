"""Why is the fused single-program frame slower than split (29.8 vs 24.3
ms @262K/720p, BENCH r3 preview)? Device-clock attribution: run the fused
loop under the XLA profiler and compare the fused module's on-device time
against split mode's render+step sum (~17.7 ms).

Run DETACHED: nohup python experiments/fused_profile.py > /tmp/fused_profile.log 2>&1 &
"""

import glob
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def sync(x):
    from multi_adapter_particles_tpu.utils.timers import sync as s

    s(x)


def main():
    from multi_adapter_particles_tpu.config import (
        AppConfig, RenderConfig, SimConfig,
    )
    from multi_adapter_particles_tpu.runtime.orchestrator import ParticlesApp
    from experiments.frame_profile import parse_device_plane

    n = 262_144
    print(f"backend={jax.default_backend()} n={n}", flush=True)
    app = ParticlesApp(
        AppConfig(num_particles=n, vsync=False, gui=False),
        SimConfig(num_particles=n),
        RenderConfig(width=1280, height=720),
        seed=42, fused=True, async_timers=False,
    )

    def drain():
        app.compute.wait_for_gpu()

    for _ in range(12):
        app.draw()
    drain()
    t0 = time.perf_counter()
    for _ in range(30):
        app.draw()
    drain()
    ms = (time.perf_counter() - t0) * 1000.0 / 30
    print(f"fused frame wall: {ms:.2f} ms/frame", flush=True)

    log_dir = tempfile.mkdtemp(prefix="fused_profile_")
    try:
        opts = jax.profiler.ProfileOptions()
        opts.python_tracer_level = 0
        opts.host_tracer_level = 0
        jax.profiler.start_trace(log_dir, profiler_options=opts)
    except TypeError:
        jax.profiler.start_trace(log_dir)
    for _ in range(10):
        app.draw()
    drain()
    jax.profiler.stop_trace()
    per, busy = parse_device_plane(log_dir)
    print(f"device busy {busy/10:.2f} ms/frame", flush=True)
    for nm, (avg, cnt) in sorted(per.items(), key=lambda kv: -kv[1][0]):
        print(f"  {nm:40s} {avg:8.3f} ms x{cnt}", flush=True)
    app.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
