"""Where does the fused frame program lose to split dispatch?

Times, on the same device and data: (a) the render program alone, (b) the
sim step alone, (c) the fused render+step program (FusedEngine's exact
jit). If c > a + b, XLA compiles the combined program worse (scheduling /
layout copies); if c == a + b but the orchestrator A/B still shows a gap,
the loss is host-side frame plumbing.

Run:  python experiments/fused_overhead.py [N]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main() -> int:
    from multi_adapter_particles_tpu.config import (
        AppConfig, RenderConfig, SimConfig,
    )
    from multi_adapter_particles_tpu.models import init as pinit, integrator
    from multi_adapter_particles_tpu.render.camera import Camera
    from multi_adapter_particles_tpu.render.renderer import Renderer
    from multi_adapter_particles_tpu.runtime.fused import FusedEngine
    from multi_adapter_particles_tpu.utils.timers import sync

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 262_144
    print(f"backend={jax.default_backend()} n={n}", flush=True)
    reps = 20

    cfg = SimConfig(num_particles=n)
    rcfg = RenderConfig()
    state = pinit.initialize_particles_device(n, seed=42)
    camera = Camera(position=rcfg.camera_position)
    renderer = Renderer(rcfg)

    # (a) render alone
    out = renderer.render_arrays(state.position, camera, 2.5, 0.15)
    sync(out.frame)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = renderer.render_arrays(state.position, camera, 2.5, 0.15)
    sync(out.frame)
    a = (time.perf_counter() - t0) * 1000 / reps
    print(f"render alone: {a:7.2f} ms", flush=True)

    # (b) step alone (no donation so `state` can be reused below)
    step = integrator.make_step(cfg, donate=False)
    s2 = step(state)
    sync(s2.position)
    t0 = time.perf_counter()
    for _ in range(reps):
        s2 = step(state)
    sync(s2.position)
    b = (time.perf_counter() - t0) * 1000 / reps
    print(f"  step alone: {b:7.2f} ms", flush=True)

    # (c) the fused engine's frame (its exact jit + host plumbing)
    eng = FusedEngine(cfg, rcfg, jax.devices()[0], seed=42)
    app = AppConfig(num_particles=n, vsync=False, gui=False)
    eng.frame(app)
    eng.wait_for_gpu()
    t0 = time.perf_counter()
    for _ in range(reps):
        eng.frame(app)
    eng.wait_for_gpu()
    c = (time.perf_counter() - t0) * 1000 / reps
    print(f" fused frame: {c:7.2f} ms  (a+b = {a + b:.2f})", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
