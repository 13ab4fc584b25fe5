"""-diagnostics at the reference-default 4M: ms/sample A/B of the
round-4 fused tree gauge vs the round-5 run-accel reuse path
(VERDICT r4 #4 — "cut 5.1 s/sample toward ~1.6 s by reusing the
frame's accel").

The mesh gauge needs a velocity half-kick to de-stagger the symplectic
state before the kinetic term. Round 4 computed a full tree-P3M force
inside the gauge for that (~3.5 s of the 5.1 s sample). Round 5 threads
the run's OWN force in instead (DiagnosticsProbe use_run_accel — auto
for pm_grid runs above the exact threshold): the gauge then runs
`mesh_potential_only` (a potential-only tree sweep, ~2x fewer pair ops)
and the accel is one cheap PM solve. Equality of the potential between
the two paths is pinned by
tests/test_diagnostics.py::TestMeshPotential::test_potential_only_equals_fused.

Run DETACHED:
  nohup python experiments/diag_reuse_4m.py > /tmp/diag_reuse_4m.log 2>&1 &

RESULTS (on-chip v5e, 2026-08-20; budget=113428 @ gauge grid 256):

  fused-tree-gauge (r4)     4987.4 ms/sample   energy=-5.242560e+06
  run-accel-reuse  (r5)     3234.0 ms/sample   energy=-5.242528e+06
  energy agreement (tree half-kick vs PM half-kick): 6.1e-06 relative

-35%: the reuse sheds the gauge's force work entirely (the r4 fused
sweep computed potential+accel together; the r5 potential-only sweep
is ~half its pair ops, and the PM half-kick solve is ~0.15 s). The
residual 3.2 s is the short-range potential sweep itself — op-bound
at ~80% of the VPU ceiling like the force sweep (CLAUDE.md), so the
VERDICT-r4 ~1.6 s target would need a cheaper potential formulation,
not more reuse. Recorded in ROADMAP.md and CLAUDE.md anchors.

SUPERSEDED later in round 5: the "op-bound, no lever left" reading was
per DIRECTED pair — the gauge only needs the total, so the Newton-3rd
halved enumeration + probed sub budgets + the scalar-total path took
the sample to 2073 ms (experiments/diag_halfpair_4m.py,
experiments/diag_total_4m.py).
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N = 4_194_304


def main():
    import jax

    from multi_adapter_particles_tpu.config import SimConfig
    from multi_adapter_particles_tpu.models import init as pinit
    from multi_adapter_particles_tpu.models.diagnostics import (
        DiagnosticsProbe, _gauge_grid,
    )
    from multi_adapter_particles_tpu.ops.treeforce import host_pair_budget
    from multi_adapter_particles_tpu.utils import compilecache
    from multi_adapter_particles_tpu.utils.metrics import MetricsRegistry

    compilecache.enable("auto")
    print(f"backend={jax.default_backend()}", flush=True)

    cfg0 = SimConfig(
        num_particles=N, force_model="pm_grid", pm_grid_size=128,
        interaction_scale=1.0 / N,
    )
    state = pinit.initialize_particles_device(N, seed=42)
    _ = float(np.asarray(jax.device_get(state.position[0, 0])))
    print("state ready", flush=True)

    # Size the tree pair budget ONCE (one host sort at 4M) and bake it
    # into the config so both probes share it — the A/B times the
    # per-sample gauge, not the one-time probe.
    gg = _gauge_grid(N, cfg0.pm_grid_size)
    r_c = cfg0.p3m_cutoff_cells * cfg0.pm_box / gg
    gn = max(int(cfg0.pm_box // r_c), 1)
    t0 = time.perf_counter()
    budget = host_pair_budget(np.asarray(state.position), cfg0.pm_box,
                              r_c, gn)
    print(f"budget={budget} (gauge grid {gg}, "
          f"{time.perf_counter()-t0:.0f}s host probe)", flush=True)
    cfg = dataclasses.replace(cfg0, p3m_pair_budget=budget)

    energies = {}
    for label, use in (
        ("fused-tree-gauge (r4)", False),
        ("run-accel-reuse (r5)", True),
    ):
        probe = DiagnosticsProbe(cfg, 1, use_run_accel=use)
        m = MetricsRegistry()
        t0 = time.perf_counter()
        probe.maybe_publish(0, state, m)
        print(f"{label:24s} first sample (compile) "
              f"{time.perf_counter()-t0:7.1f} s", flush=True)
        reps = 3
        t0 = time.perf_counter()
        for i in range(1, reps + 1):
            probe.maybe_publish(i, state, m)
        ms = (time.perf_counter() - t0) * 1000.0 / reps
        energies[label] = m.gauges["energy"]
        print(f"{label:24s} {ms:9.1f} ms/sample   "
              f"energy={m.gauges['energy']:.6e}", flush=True)
    vals = list(energies.values())
    rel = abs(vals[0] - vals[1]) / max(abs(vals[0]), 1e-30)
    print(f"energy agreement (tree half-kick vs PM half-kick): "
          f"{rel:.2e} relative", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
