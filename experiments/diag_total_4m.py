"""-diagnostics at 4M, round-5 third cut: scalar-TOTAL gauge path.

On top of the Newton-3rd halved sweep (experiments/diag_halfpair_4m.py),
`p3m_potential_total_with_overflow` removes every per-particle
materialization the gauge never needed:

  - long part by the CIC ADJOINT identity
    sum_i phi_gathered(x_i) == sum_c phi(c) * rho(c) — one elementwise
    G³ dot against the already-deposited rho replaces the G³
    scalar corner-row packing (pm._pack_scalar_corner_rows) and the
    N-row trilinear gather-back (pm._interp_scalar; ~4M lane-packed row
    gathers at the reference-default N);
  - near part summed on the sweep's gated block-order output
    (near_field_tree total_only=True) — skips the E=4M un-sort payload
    sort.

Equality with the per-particle path is pinned by
tests/test_p3m.py::TestPotentialTotal (rel 2e-6, incl. out-of-box
particles and the interpret-mode Pallas sweep).

This harness A/Bs on chip at 4M (gauge grid 256, probed budgets):
  1. mesh_potential_only(total_only=False)  — halved, per-particle
  2. mesh_potential_only(total_only=True)   — halved, scalar total
  3. the full DiagnosticsProbe run-accel-reuse sample (production)

Run DETACHED (verify skill: never timeout-kill a TPU job):
  nohup python experiments/diag_total_4m.py > /tmp/diag_total_4m.log 2>&1 &

RESULTS (on-chip v5e, 2026-08-21; G=256 budget=113428 sub=995569):

  halved per-particle (r5b)      1830.6 ms/solve   U=-2.973582e+08
  halved scalar-total (r5c)      1739.8 ms/solve   U=-2.973581e+08
  full probe sample (production) 2072.8 ms/sample  energy=-5.242432e+06
  potential agreement per-particle vs total: 4.30e-07 relative

-5% on the solve: the per-particle tail (corner-row packing +
4M-row gather-back + E=4M un-sort) was ~91 ms — real but small next to
the op-bound sweep. Cumulative -diagnostics @4M across round 5:
4987 (r4 fused) -> 3234 (run-accel reuse) -> 2164 (halved + sub
budget) -> 2073 ms/sample (scalar total) = -58% vs round 4. The
residual splits ~1.03 s halved sweep (op-bound, ~80% of VPU ceiling)
+ ~0.7 s mesh long solve/deposit + ~0.3 s PM half-kick accel + sync.
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
        DiagnosticsProbe, _gauge_grid, mesh_potential_only,
    )
    from multi_adapter_particles_tpu.ops.treeforce import (
        PAIR_HEADROOM, host_tree_counts,
    )
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

    gg = _gauge_grid(N, cfg0.pm_grid_size)
    r_c = cfg0.p3m_cutoff_cells * cfg0.pm_box / gg
    gn = max(int(cfg0.pm_box // r_c), 1)
    t0 = time.perf_counter()
    coarse, subc, _blk = host_tree_counts(
        np.asarray(state.position), cfg0.pm_box, r_c, gn
    )
    budget = int(coarse * PAIR_HEADROOM) + 1
    sub = None if subc is None else int(subc * PAIR_HEADROOM) + 2
    print(f"G={gg}: budget={budget} sub={sub} "
          f"({time.perf_counter()-t0:.0f}s host probe)", flush=True)
    cfg = dataclasses.replace(cfg0, p3m_pair_budget=budget,
                              p3m_sub_pair_budget=sub)
    g_scale = cfg.mass * cfg.interaction_scale

    pots = {}
    for label, total in (
        ("halved per-particle (r5b)", False),
        ("halved scalar-total (r5c)", True),
    ):
        fn = jax.jit(lambda p, t=total: mesh_potential_only(
            p, g_scale, cfg.softening_squared, grid=gg, box=cfg.pm_box,
            cutoff_cells=cfg.p3m_cutoff_cells, pair_budget=budget,
            sub_pair_budget=sub, half_pairs=True, total_only=t,
        ))
        t0 = time.perf_counter()
        pot, dropped = fn(state.position)
        pot_v, drop_v = float(pot), int(dropped)
        print(f"{label} first (compile) {time.perf_counter()-t0:7.1f} s "
              f"dropped={drop_v}", flush=True)
        assert drop_v == 0, f"dropped pairs: {drop_v}"
        reps = 3
        t0 = time.perf_counter()
        for _ in range(reps):
            pot, dropped = fn(state.position)
            pot_v = float(pot)   # host sync (Pallas: block_until_ready lies)
        ms = (time.perf_counter() - t0) * 1000.0 / reps
        pots[label] = pot_v
        print(f"{label} {ms:9.1f} ms/solve   U={pot_v:.6e}", flush=True)

    vals = list(pots.values())
    rel = abs(vals[0] - vals[1]) / max(abs(vals[0]), 1e-30)
    print(f"potential agreement per-particle vs total: {rel:.2e} relative",
          flush=True)

    probe = DiagnosticsProbe(cfg, 1, use_run_accel=True)
    m = MetricsRegistry()
    t0 = time.perf_counter()
    probe.maybe_publish(0, state, m)
    print(f"full probe (production) first sample (compile) "
          f"{time.perf_counter()-t0:7.1f} s", flush=True)
    reps = 3
    t0 = time.perf_counter()
    for i in range(1, reps + 1):
        probe.maybe_publish(i, state, m)
    ms = (time.perf_counter() - t0) * 1000.0 / reps
    print(f"full probe sample (production) {ms:9.1f} ms/sample   "
          f"energy={m.gauges['energy']:.6e}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
