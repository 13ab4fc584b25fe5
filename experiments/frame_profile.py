"""Attribute the split-mode frame time @262K/720p (VERDICT r2 weak #1).

BENCH_r02 measured 37.3 ms/frame while render-only @1024² is 20.3 ms and
central-well sim ~1 ms — the frame is ~2x the sum of its stages. Suspects:
per-dispatch host overhead over the axon tunnel, the pacing marker, the
per-frame scalar uploads, or 720p render simply not being cheaper than
1024² (the E=N*dup sort is resolution-independent).

Measures, in one TPU process:
  1. dispatch overhead: enqueue rate + round-trip latency of a tiny jit op
  2. render-only production path @262K at 720p AND 1024²
  3. the split frame loop (bench config) wall time, then a profiler-traced
     window parsed for per-module DEVICE time + device busy fraction
  4. frame loop at framelatency 2 vs 8 (is the gap pipelining depth?)

Run DETACHED on the real chip (takes ~6-10 min incl. warm-up):
  nohup python experiments/frame_profile.py > /tmp/frame_profile.log 2>&1 &
"""

import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def note(msg):
    print(msg, flush=True)


def sync(x):
    from multi_adapter_particles_tpu.utils.timers import sync as s

    s(x)


def bench_dispatch():
    """Host cost of getting work onto the device over the tunnel."""

    @jax.jit
    def tiny(x):
        return x * 1.000001 + 0.5

    x = jnp.ones((8, 128), jnp.float32)
    x = tiny(x)
    sync(x)

    # enqueue rate: chained dispatches, one final sync
    reps = 200
    t0 = time.perf_counter()
    for _ in range(reps):
        x = tiny(x)
    enq_ms = (time.perf_counter() - t0) * 1000.0 / reps
    t0 = time.perf_counter()
    sync(x)
    drain_ms = (time.perf_counter() - t0) * 1000.0
    note(f"dispatch enqueue: {enq_ms:.3f} ms/call (drain {drain_ms:.1f} ms)")

    # round-trip latency: dispatch + host sync each time
    reps = 50
    t0 = time.perf_counter()
    for _ in range(reps):
        x = tiny(x)
        sync(x)
    rt_ms = (time.perf_counter() - t0) * 1000.0 / reps
    note(f"dispatch+sync round-trip: {rt_ms:.3f} ms/call")


def bench_render_only(n, w, h, reps=20):
    from multi_adapter_particles_tpu.config import RenderConfig
    from multi_adapter_particles_tpu.models import init as pinit
    from multi_adapter_particles_tpu.render.camera import Camera
    from multi_adapter_particles_tpu.render.renderer import Renderer

    cfg = RenderConfig(width=w, height=h)
    r = Renderer(cfg)
    camera = Camera(position=cfg.camera_position)
    state = pinit.initialize_particles_device(n, seed=42)
    sync(state.position)
    out = None
    for _ in range(3):
        out = r.render_arrays(state.position, camera, 2.5, 0.15)
    sync(out.frame)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = r.render_arrays(state.position, camera, 2.5, 0.15)
    sync(out.frame)
    ms = (time.perf_counter() - t0) * 1000.0 / reps
    note(f"render-only @{n} {w}x{h}: {ms:.2f} ms  (seg_q="
         f"{r.resolve_seg_q(state.padded_count)})")
    return ms


def parse_device_plane(log_dir):
    """-> (module_ms dict averaged per execution, total_busy_ms, n_execs)."""
    from jax.profiler import ProfileData

    paths = glob.glob(os.path.join(log_dir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        note("  !! no xplane found")
        return {}, 0.0
    totals, counts = {}, {}
    busy = 0.0
    for plane in ProfileData.from_file(paths[0]).planes:
        for line in plane.lines:
            if line.name != "XLA Modules":
                continue
            for ev in line.events:
                d = getattr(ev, "duration_ns", None)
                if d is None:
                    continue
                nm = ev.name.split("(")[0]
                totals[nm] = totals.get(nm, 0.0) + d / 1e6
                counts[nm] = counts.get(nm, 0) + 1
                busy += d / 1e6
    per = {k: (totals[k] / counts[k], counts[k]) for k in totals}
    return per, busy


def bench_frame_loop(n, w, h, latency, frames=40, traced=10):
    from multi_adapter_particles_tpu.config import (
        AppConfig, RenderConfig, SimConfig,
    )
    from multi_adapter_particles_tpu.runtime.orchestrator import ParticlesApp

    app = ParticlesApp(
        AppConfig(num_particles=n, vsync=False, gui=False,
                  max_frame_latency=latency),
        SimConfig(num_particles=n),
        RenderConfig(width=w, height=h),
        seed=42,
        async_timers=False,
    )

    def drain():
        app.compute.wait_for_gpu()
        if app.render.last_frame is not None:
            sync(app.render.last_frame)

    for _ in range(6):
        app.draw()
    drain()
    t0 = time.perf_counter()
    for _ in range(frames):
        app.draw()
    drain()
    ms = (time.perf_counter() - t0) * 1000.0 / frames
    note(f"split frame @{n} {w}x{h} latency={latency}: {ms:.2f} ms/frame")

    # traced window
    import tempfile

    log_dir = tempfile.mkdtemp(prefix="frame_profile_")
    try:
        opts = jax.profiler.ProfileOptions()
        opts.python_tracer_level = 0
        opts.host_tracer_level = 0
        jax.profiler.start_trace(log_dir, profiler_options=opts)
    except TypeError:
        jax.profiler.start_trace(log_dir)
    t0 = time.perf_counter()
    for _ in range(traced):
        app.draw()
    drain()
    wall_ms = (time.perf_counter() - t0) * 1000.0 / traced
    jax.profiler.stop_trace()
    per, busy = parse_device_plane(log_dir)
    note(f"  traced window: wall {wall_ms:.2f} ms/frame, device busy "
         f"{busy / traced:.2f} ms/frame ({busy:.1f} total)")
    for nm, (avg, cnt) in sorted(per.items(), key=lambda kv: -kv[1][0]):
        note(f"    {nm:40s} {avg:8.3f} ms x{cnt}")
    app.shutdown()
    return ms


def main():
    note(f"backend={jax.default_backend()} devices={jax.devices()}")
    t0 = time.perf_counter()
    bench_dispatch()
    note(f"+{time.perf_counter()-t0:.0f}s")
    n = 262_144
    bench_render_only(n, 1280, 720)
    bench_render_only(n, 1024, 1024)
    note(f"+{time.perf_counter()-t0:.0f}s")
    bench_frame_loop(n, 1280, 720, latency=2)
    bench_frame_loop(n, 1280, 720, latency=8)
    note(f"done +{time.perf_counter()-t0:.0f}s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
