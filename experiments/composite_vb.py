"""A/B the composite kernel's virtual-row block width (vb).

The dead-tail skip (ops/composite.py row_hi) quantizes the dynamic trip
count to the MAX live slot over each vb-row grid block: a wide block is
held hostage by its longest row. Smaller vb tightens the bound (more
blocks skip / shorten) but multiplies per-block fixed costs and shrinks
the lane dimension of every VMEM operand. This sweeps vb at the
production render sizes to see if 512 (the pre-skip default, chosen when
every block ran the full Q loop anyway) is still right.

Run on the real chip: python experiments/composite_vb.py [N ...]
(defaults 4194304). jax.clear_caches() between variants. _render imports
composite_rows_pallas from ops.composite at trace time, so the patch
must land on THAT module — the first version of this sweep patched a
renderer attribute nothing reads and measured vb=512 three times
(caught in the round-4 review; re-run fixed 2026-08-19).
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from multi_adapter_particles_tpu.ops import composite as composite_mod


def main() -> int:
    sizes = [int(a) for a in sys.argv[1:]] or [4_194_304]

    from multi_adapter_particles_tpu.config import RenderConfig
    from multi_adapter_particles_tpu.models import init as pinit
    from multi_adapter_particles_tpu.render.camera import Camera
    from multi_adapter_particles_tpu.render.renderer import Renderer

    print(f"backend={jax.default_backend()}", flush=True)
    orig = composite_mod.composite_rows_pallas

    for n in sizes:
        cfg = RenderConfig(width=1024, height=1024)
        camera = Camera(position=cfg.camera_position)
        state = pinit.initialize_particles_device(n, seed=42)
        float(state.position[0, 0])  # sync init

        base_frame = None
        for vb in (512, 256, 128):
            composite_mod.composite_rows_pallas = functools.partial(
                orig, vb=vb
            )
            jax.clear_caches()
            renderer = Renderer(cfg)
            out = None
            for _ in range(3):  # compile + warm
                out = renderer.render_arrays(state.position, camera, 2.5,
                                             0.15)
            float(out.frame[0, 0, 0])  # Pallas-safe sync
            reps = 5
            t0 = time.perf_counter()
            for _ in range(reps):
                out = renderer.render_arrays(state.position, camera, 2.5,
                                             0.15)
            float(out.frame[0, 0, 0])
            ms = (time.perf_counter() - t0) * 1000.0 / reps
            import numpy as np

            f = np.asarray(out.frame)
            if base_frame is None:
                base_frame = f
                eq = "ref"
            else:
                eq = "BITEQ" if np.array_equal(f, base_frame) else (
                    f"MAXDIFF {np.abs(f - base_frame).max():.2e}")
            print(f"render @{n:>9} vb={vb:<4} {ms:8.2f} ms  [{eq}]",
                  flush=True)
        composite_mod.composite_rows_pallas = orig
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
