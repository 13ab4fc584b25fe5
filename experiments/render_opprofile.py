"""Op-level device-time attribution of the production render pipeline.

The stage-level numbers (experiments/render_profile.py: front 2.2, sort
9.7, rowbuild 3.4, composite 3.7, combine 0.5 @262K 1024²) bound WHERE
time goes, but the non-sort ~6 ms is spread over dozens of XLA fusions —
before building a Pallas front end (ROADMAP's remaining render lever),
this measures exactly which fusions cost what: trace N renders with the
XLA profiler and aggregate the device plane's op-level events.

Run on the real chip: python experiments/render_opprofile.py [N] [W] [H]
(detached — see .claude/skills/verify/SKILL.md).
"""

import glob
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 262_144
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    h = int(sys.argv[3]) if len(sys.argv) > 3 else 1024

    from multi_adapter_particles_tpu.config import RenderConfig
    from multi_adapter_particles_tpu.models import init as pinit
    from multi_adapter_particles_tpu.render.camera import Camera
    from multi_adapter_particles_tpu.render.renderer import Renderer
    from multi_adapter_particles_tpu.utils.timers import sync

    print(f"backend={jax.default_backend()} n={n} {w}x{h}", flush=True)
    cfg = RenderConfig(width=w, height=h)
    renderer = Renderer(cfg)
    camera = Camera(position=cfg.camera_position)
    state = pinit.initialize_particles_device(n, seed=42)
    sync(state.position)

    out = None
    for _ in range(3):  # compile + warm
        out = renderer.render_arrays(state.position, camera, 2.5, 0.15)
    sync(out.frame)

    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        out = renderer.render_arrays(state.position, camera, 2.5, 0.15)
    sync(out.frame)
    wall_ms = (time.perf_counter() - t0) * 1000.0 / reps
    print(f"wall: {wall_ms:.2f} ms/render", flush=True)

    log_dir = tempfile.mkdtemp(prefix="render_opprof_")
    jax.profiler.start_trace(log_dir)
    for _ in range(reps):
        out = renderer.render_arrays(state.position, camera, 2.5, 0.15)
    sync(out.frame)
    jax.profiler.stop_trace()

    from jax.profiler import ProfileData

    paths = glob.glob(os.path.join(log_dir, "**", "*.xplane.pb"),
                      recursive=True)
    print(f"trace files: {paths}", flush=True)
    totals = {}
    counts = {}
    line_names = set()
    for path in paths:
        pd = ProfileData.from_serialized_xspace(open(path, "rb").read())
        for plane in pd.planes:
            if "TPU" not in plane.name and "Device" not in plane.name:
                continue
            for line in plane.lines:
                line_names.add(f"{plane.name}/{line.name}")
                if line.name not in ("XLA Ops", "XLA Modules"):
                    continue
                tag = "op" if line.name == "XLA Ops" else "mod"
                for ev in line.events:
                    dur = getattr(ev, "duration_ns", None)
                    if dur is None:
                        continue
                    key = (tag, ev.name)
                    totals[key] = totals.get(key, 0.0) + dur
                    counts[key] = counts.get(key, 0) + 1
    print(f"device lines seen: {sorted(line_names)}", flush=True)

    for tag in ("mod", "op"):
        rows = [(v, k[1]) for k, v in totals.items() if k[0] == tag]
        rows.sort(reverse=True)
        print(f"\n== {tag} totals over {reps} renders ==", flush=True)
        shown = 0
        other = 0.0
        for v, name in rows:
            ms = v / 1e6 / reps
            if shown < 45 and ms >= 0.01:
                c = counts[(tag, name)]
                print(f"  {ms:8.3f} ms x{c//reps:<3d} {name[:110]}",
                      flush=True)
                shown += 1
            else:
                other += ms
        print(f"  {other:8.3f} ms (other)", flush=True)
    total_op = sum(v for k, v in totals.items() if k[0] == "op") / 1e6 / reps
    print(f"\nop total {total_op:.2f} ms vs wall {wall_ms:.2f} ms", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
