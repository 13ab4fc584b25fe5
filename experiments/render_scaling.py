"""Render-only scaling after the round-3 rework (4-op sort, q15 centers,
seg_q retune): 262K / 1M / 4M single-pass + 16.8M chunked, 1024².

Round-2 numbers to compare: 19-21 / 56.6 / 235.8 / 928 ms.

Run DETACHED: nohup python experiments/render_scaling.py > /tmp/render_scaling.log 2>&1 &
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def sync(x):
    from multi_adapter_particles_tpu.utils.timers import sync as s

    s(x)


def main():
    from multi_adapter_particles_tpu.config import RenderConfig
    from multi_adapter_particles_tpu.models import init as pinit
    from multi_adapter_particles_tpu.render.camera import Camera
    from multi_adapter_particles_tpu.render.renderer import Renderer

    print(f"backend={jax.default_backend()}", flush=True)
    cfg = RenderConfig(width=1024, height=1024)
    camera = Camera(position=cfg.camera_position)
    for n, reps in ((262_144, 20), (1_048_576, 10), (4_194_304, 5),
                    (16_777_216, 3)):
        try:
            r = Renderer(cfg)
            state = pinit.initialize_particles_device(n, seed=42)
            sync(state.position)
            out = None
            for _ in range(2):
                out = r.render_arrays(state.position, camera, 2.5, 0.15)
            sync(out.frame)
            t0 = time.perf_counter()
            for _ in range(reps):
                out = r.render_arrays(state.position, camera, 2.5, 0.15)
            sync(out.frame)
            ms = (time.perf_counter() - t0) * 1000.0 / reps
            q = r.resolve_seg_q(state.padded_count)
            chunked = n > r.chunk_threshold
            print(f"render @{n:>9} 1024²: {ms:8.2f} ms "
                  f"(seg_q={q}, chunked={chunked})", flush=True)
            del state, out, r
        except Exception as ex:  # noqa: BLE001
            print(f"render @{n}: FAILED {type(ex).__name__}: {ex}",
                  flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
