"""Render host-dispatch overhead attribution (VERDICT r4 #7).

ROADMAP records ~3.5 ms/render of host-side overhead at 262K/1024²:
render-only wall 11.3-11.9 ms vs ~8.4 ms device. This experiment
attributes that gap on the real chip:

  prep     — Python arg prep only (camera matrices + akey + resolve_seg_q)
  enqueue  — render_arrays dispatch WITHOUT any sync (host cost to
             enqueue one frame; device drains in parallel)
  sync     — render + sync(frame) per frame (one host read)
  present  — render + RenderEngine.present() semantics per frame
             (sync + the raise_dup_for truncated/span host reads)

Run DETACHED on the chip: nohup python experiments/render_dispatch.py \
    > /tmp/render_dispatch.log 2>&1 &

Findings (v5e, 262144 @1024², 2026-08-19):
  BEFORE the present fix: prep 0.24 ms | enqueue 0.97 | +sync 41.15
  | +present 71.98 — present paid TWO full tunnel round trips
  (sync(frame), then raise_dup_for's int(out.truncated) as a separate
  device_get). AFTER (present packs fence + truncated + spans into one
  [4] device_get — runtime/render_engine._present_probe): prep 0.28 |
  enqueue 0.83 | +sync 42.70 | +present 41.36 — present now costs
  exactly one sync. Interpretation of the round-3 "~3.5 ms host slack":
  the true per-dispatch HOST cost is ~0.8-1.0 ms (enqueue); a synced
  loop is floored by the ~35 ms tunnel RTT per read regardless (the
  frame loop hides it with dispatch-ahead + pacing; profile windows and
  present-synced paths paid the double RTT until this fix).
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import numpy as np

from multi_adapter_particles_tpu.config import AppConfig, RenderConfig
from multi_adapter_particles_tpu.models import init as pinit
from multi_adapter_particles_tpu.render.camera import Camera
from multi_adapter_particles_tpu.render.renderer import Renderer
from multi_adapter_particles_tpu.runtime.render_engine import RenderEngine
from multi_adapter_particles_tpu.utils.timers import sync

N = 262_144
W = H = 1024
K = 60


def main():
    print("backend:", jax.default_backend(), flush=True)
    state = pinit.initialize_particles_device(N, seed=42)
    pos = state.position
    cfg = RenderConfig(width=W, height=H)
    app = AppConfig(num_particles=N)
    cam = Camera(position=cfg.camera_position)
    r = Renderer(cfg)

    # warm: compile + tunnel
    out = r.render_arrays(pos, cam, app.particle_size, app.particle_intensity)
    sync(out.frame)
    print("compiled", flush=True)

    # prep-only loop (no dispatch): matrices + akey + seg_q
    t0 = time.perf_counter()
    for _ in range(K * 10):
        proj = cam.projection_matrix(cfg.aspect, cfg.fov_y, cfg.near, cfg.far)
        wvp = cam.world_view_projection(
            cfg.aspect, fov_y=cfg.fov_y, near=cfg.near, far=cfg.far
        )
        _ = (wvp.tobytes(), float(proj[0, 0]), r.resolve_seg_q(N))
    print(f"prep: {(time.perf_counter()-t0)/(K*10)*1e3:.3f} ms", flush=True)

    # enqueue-only: host cost per dispatch, device drains behind
    t0 = time.perf_counter()
    for _ in range(K):
        out = r.render_arrays(
            pos, cam, app.particle_size, app.particle_intensity
        )
    t_enq = (time.perf_counter() - t0) / K * 1e3
    sync(out.frame)
    print(f"enqueue: {t_enq:.2f} ms", flush=True)

    # render + sync per frame
    t0 = time.perf_counter()
    for _ in range(K):
        out = r.render_arrays(
            pos, cam, app.particle_size, app.particle_intensity
        )
        sync(out.frame)
    print(f"+sync: {(time.perf_counter()-t0)/K*1e3:.2f} ms", flush=True)

    # full present() semantics
    eng = RenderEngine(cfg, jax.devices()[0], camera=cam, renderer=r)
    eng.draw(pos, app)
    eng.present()
    t0 = time.perf_counter()
    for _ in range(K):
        eng.draw(pos, app)
        eng.present()
    print(f"+present: {(time.perf_counter()-t0)/K*1e3:.2f} ms", flush=True)

    assert np.isfinite(np.asarray(out.frame)).all()
    print("RENDER_DISPATCH_OK", flush=True)


if __name__ == "__main__":
    main()
