"""What do "XLA Ops" events look like inside the fused frame module on
this TPU toolchain? (VERDICT r4 #6 groundwork.)

The fused-mode per-stage timer needs to attribute op durations WITHIN the
one fused module to simulate vs render. This probe renders a tiny fused
run under the profiler and dumps, for every device-plane line, the event
names, durations, and any per-event stats — so the parser's patterns are
grounded in what the toolchain actually emits (e.g. whether op events
carry jax.named_scope paths, HLO instruction names, or both).

Run DETACHED: nohup python experiments/fused_opnames.py > /tmp/fused_opnames.log 2>&1 &
"""

import glob
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def main():
    from multi_adapter_particles_tpu.config import (
        AppConfig, RenderConfig, SimConfig,
    )
    from multi_adapter_particles_tpu.runtime.orchestrator import ParticlesApp

    n = 65_536
    print(f"backend={jax.default_backend()} n={n}", flush=True)
    app = ParticlesApp(
        AppConfig(num_particles=n, vsync=False, gui=False),
        SimConfig(num_particles=n),
        RenderConfig(width=1280, height=720),
        seed=42, fused=True, async_timers=False,
    )
    for _ in range(6):
        app.draw()
    app.compute.wait_for_gpu()

    log_dir = tempfile.mkdtemp(prefix="fused_opnames_")
    try:
        opts = jax.profiler.ProfileOptions()
        opts.python_tracer_level = 0
        opts.host_tracer_level = 0
        jax.profiler.start_trace(log_dir, profiler_options=opts)
    except TypeError:
        jax.profiler.start_trace(log_dir)
    for _ in range(4):
        app.draw()
    app.compute.wait_for_gpu()
    jax.profiler.stop_trace()

    from jax.profiler import ProfileData

    paths = glob.glob(os.path.join(log_dir, "**", "*.xplane.pb"),
                      recursive=True)
    print(f"trace files: {paths}", flush=True)
    for path in paths:
        pd = ProfileData.from_serialized_xspace(open(path, "rb").read())
        for plane in pd.planes:
            if "TPU" not in plane.name and "Device" not in plane.name:
                continue
            print(f"\nPLANE {plane.name}", flush=True)
            for line in plane.lines:
                evs = list(line.events)
                print(f"  LINE {line.name!r}: {len(evs)} events", flush=True)
                seen = set()
                for ev in evs:
                    nm = ev.name
                    if nm in seen:
                        continue
                    seen.add(nm)
                    stats = {}
                    try:
                        stats = dict(ev.stats)
                    except Exception as e:  # noqa: BLE001
                        stats = {"<stats-error>": str(e)}
                    dur = getattr(ev, "duration_ns", None)
                    print(f"    {nm[:140]!r} dur={dur} stats={stats}",
                          flush=True)
                    if len(seen) >= 80:
                        print("    ... (truncated)", flush=True)
                        break
    app.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
