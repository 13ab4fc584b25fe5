"""-diagnostics at 4M, round-5 second cut: Newton-3rd HALVED pair list
for the potential-only gauge (the lever CLAUDE.md's anchors said didn't
exist — "op-bound ... no cheap lever left" was true PER DIRECTED PAIR,
but the gauge only consumes the scalar total U = sum_{i<j} u_ij, so the
directed enumeration itself was 2x too much work).

`treeforce.near_field_tree(half_pairs=True)`: each unordered block pair
is swept once (j >= i at sweep granularity; diagonal block pairs keep
their full [B, B] plane and are weighted 1/2 in-kernel), the self
constant is subtracted at half weight, and the result is rescaled by 2
so the caller's 0.5*sum(u) contract is unchanged. Total equality with
the directed sweep is pinned by
tests/test_treeforce.py::TestHalfPairPotential (all sweep paths) and
tests/test_diagnostics.py::test_potential_only_equals_fused.

This harness A/Bs on chip at the reference-default 4M:
  1. mesh_potential_only directed (r5a)  — the 2026-08-20 production path
  2. mesh_potential_only halved   (r5b)  — the new default
  3. halved at gauge grid 192 — the halved sweep shifts the pair/mesh
     cost balance, so the measured G=256 optimum may move down
  4. the full DiagnosticsProbe run-accel-reuse sample (now halved +
     sub-budgeted: the probe sizes the sub-block survivor budget from
     the same host_tree_counts pass, shedding sentinel SMEM slices)

Run DETACHED (verify skill: never timeout-kill a TPU job):
  nohup python experiments/diag_halfpair_4m.py > /tmp/diag_half_4m.log 2>&1 &

RESULTS (on-chip v5e, 2026-08-21; compile cache warm — compiles
94/52/81/84 s; G=256: budget=113428 sub=995569, G=192: budget=144236
sub=1586399):

  potential-only directed (r5a)   2863.4 ms/solve   U=-2.973582e+08
  potential-only halved   (r5b)   1832.9 ms/solve   U=-2.973582e+08
  potential-only halved @G=192    2049.4 ms/solve   (G=256 stays optimal)
  full probe sample, halved       2164.0 ms/sample  energy=-5.242560e+06
  potential agreement directed vs halved: 1.08e-07 relative

-36% on the potential solve from the halving alone (both rows carry the
new sub budget); the full sample drops 3234 -> 2164 ms (-33%; the r5a
3234 number had no sub budget, so that delta conflates the two fixes).
The halved sweep is ~1.03 s of the 1.83 s solve (the directed-halved
delta); the residual ~0.8 s is mesh long part + deposit + fixed costs —
attacked next by the scalar-total path (experiments/diag_total_4m.py).
G=192 with ~2.2x the near pairs loses even halved: the pair/mesh
balance still favors 256 at 4M.
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
    import jax.numpy as jnp

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

    def probe(gg):
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
        return budget, sub

    gg = _gauge_grid(N, cfg0.pm_grid_size)
    budget, sub = probe(gg)
    budget192, sub192 = probe(192)
    cfg = dataclasses.replace(cfg0, p3m_pair_budget=budget,
                              p3m_sub_pair_budget=sub)
    g_scale = cfg.mass * cfg.interaction_scale

    pots = {}
    for label, half, g_, b_, s_ in (
        ("potential-only directed (r5a)", False, gg, budget, sub),
        ("potential-only halved   (r5b)", True, gg, budget, sub),
        ("potential-only halved @G=192 ", True, 192, budget192, sub192),
    ):
        fn = jax.jit(lambda p, h=half, g2=g_, b2=b_, s2=s_:
                     mesh_potential_only(
            p, g_scale, cfg.softening_squared, grid=g2, box=cfg.pm_box,
            cutoff_cells=cfg.p3m_cutoff_cells, pair_budget=b2,
            sub_pair_budget=s2, half_pairs=h,
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
    print(f"potential agreement directed vs halved: {rel:.2e} relative",
          flush=True)
    rel2 = abs(vals[0] - vals[2]) / max(abs(vals[0]), 1e-30)
    print(f"potential agreement G=256 vs G=192: {rel2:.2e} relative "
          f"(different Ewald split — expect ~1e-4-class)", flush=True)

    probe = DiagnosticsProbe(cfg, 1, use_run_accel=True)
    m = MetricsRegistry()
    t0 = time.perf_counter()
    probe.maybe_publish(0, state, m)
    print(f"full probe (halved) first sample (compile) "
          f"{time.perf_counter()-t0:7.1f} s", flush=True)
    reps = 3
    t0 = time.perf_counter()
    for i in range(1, reps + 1):
        probe.maybe_publish(i, state, m)
    ms = (time.perf_counter() - t0) * 1000.0 / reps
    print(f"full probe sample, halved {ms:9.1f} ms/sample   "
          f"energy={m.gauges['energy']:.6e}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
