"""4M render: single-pass vs chunked A/B (VERDICT r4 #1 harvest probe).

The 4M/1024² render op-profile (2026-08-19, /tmp/render_opprofile4m.log)
attributes 86.0 of 152.6 device ms to the ONE E=16.8M 4-operand
comparator sort and 31.5 ms to the Pallas composite. A comparator sort
is O(E log² E), so splitting the frame into k id-ordered chunks folded
through the associative composite (the machinery that already serves
>6M states) trades log² factor for per-chunk fixed costs. This measures
render-only ms at 4M for chunk sizes {single-pass, 2M, 1M, 512K}.

Run DETACHED on the chip:
  nohup python experiments/render_chunk4m.py > /tmp/render_chunk4m.log 2>&1 &

Findings (v5e, per-frame-synced wall incl. ~35 ms tunnel RTT,
2026-08-19): single-pass 187.30 ms | chunk=2M 181.81 | chunk=1M 173.68
| chunk=512K 275.28 (per-chunk fixed costs dominate); all chunked
frames equal the single-pass frame to max|Δ| 2.98e-07 (the associative
fold's reassociation). LANDED: Renderer defaults chunk_threshold=3M,
chunk_size=1M — 4M renders now fold 4 x 1M chunks (~-9% device time);
<=1M stays single-pass (measured optimal there).
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import numpy as np

from multi_adapter_particles_tpu.config import RenderConfig
from multi_adapter_particles_tpu.models import init as pinit
from multi_adapter_particles_tpu.render.camera import Camera
from multi_adapter_particles_tpu.render.renderer import Renderer
from multi_adapter_particles_tpu.utils.timers import sync

N = 4_194_304
W = H = 1024
WARM, TIMED = 3, 6


def main():
    print("backend:", jax.default_backend(), flush=True)
    pos = pinit.initialize_particles_device(N, seed=42).position
    cfg = RenderConfig(width=W, height=H)
    cam = Camera(position=cfg.camera_position)

    ref = None
    for chunk in (None, 2_097_152, 1_048_576, 524_288):
        r = Renderer(cfg)
        if chunk is not None:
            r.chunk_threshold = chunk  # force the chunked path
            r.chunk_size = chunk
        label = "single-pass" if chunk is None else f"chunk={chunk}"
        try:
            out = r.render_arrays(pos, cam, 3.0, 0.35)
            sync(out.frame)
            for _ in range(WARM - 1):
                out = r.render_arrays(pos, cam, 3.0, 0.35)
            sync(out.frame)
            t0 = time.perf_counter()
            for _ in range(TIMED):
                out = r.render_arrays(pos, cam, 3.0, 0.35)
                sync(out.frame)
            dt = (time.perf_counter() - t0) / TIMED * 1e3
            frame = np.asarray(out.frame)
            if ref is None:
                ref = frame
                err = 0.0
            else:
                err = float(np.abs(frame - ref).max())
            print(f"{label:16s}: {dt:8.2f} ms  (max|Δ| vs single "
                  f"{err:.2e})", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{label:16s}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
    print("RENDER_CHUNK4M_OK", flush=True)


if __name__ == "__main__":
    main()
