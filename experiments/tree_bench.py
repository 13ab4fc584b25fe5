"""Tree-P³M on the DEMO scene at full scale (VERDICT r2 #2 'done' gate).

Measures, on the real chip, the two-cluster demo init @262K:
  - all-pairs exact step ms (the reference's only exact mode) — baseline
  - tree-P³M step ms at G=64 and G=128 (+ accuracy vs exact on a
    subsample), dropped-pair count
  - pm_grid step ms for context (the smooth-only alternative)

Done criterion: tree-P³M <1% RMS vs exact on the standard init at 262K
with step time << all-pairs.

Run DETACHED: nohup python experiments/tree_bench.py > /tmp/tree_bench.log 2>&1 &
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
    from multi_adapter_particles_tpu.utils.timers import sync as s

    s(x)


def main():
    from multi_adapter_particles_tpu.config import SimConfig
    from multi_adapter_particles_tpu.models import init as pinit, integrator
    from multi_adapter_particles_tpu.ops import p3m

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 262_144
    print(f"backend={jax.default_backend()} n={n}", flush=True)
    state = pinit.initialize_particles_device(n, seed=42)
    sync(state.position)
    pos = state.position

    # exact all-pairs accel (XLA path is fine for a reference value)
    t0 = time.perf_counter()
    a_exact = integrator.all_pairs_accel(
        pos, mass=70000.0, softening_squared=25.0, interaction_scale=1.0
    )
    sync(a_exact)
    print(f"exact all-pairs accel compile+run: "
          f"{time.perf_counter()-t0:.1f}s", flush=True)
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        a_exact = integrator.all_pairs_accel(
            pos, mass=70000.0, softening_squared=25.0, interaction_scale=1.0
        )
    sync(a_exact)
    exact_ms = (time.perf_counter() - t0) * 1000.0 / reps
    print(f"exact all-pairs accel: {exact_ms:.1f} ms", flush=True)
    a_ex = np.asarray(a_exact)
    scale = np.abs(a_ex).max()

    from multi_adapter_particles_tpu.ops.treeforce import host_pair_budget

    pos_host = np.asarray(pos)
    for grid in (64, 128):
        try:
            r_c = 6.75 * 2048.0 / grid
            gn = max(int(2048.0 // r_c), 1)
            budget = host_pair_budget(pos_host, 2048.0, r_c, gn)
            t0 = time.perf_counter()
            acc, dropped = p3m.p3m_accel_with_overflow(
                pos, grid=grid, box=2048.0, g_const=70000.0,
                softening_squared=25.0, near_mode="tree",
                pair_budget=budget,
            )
            sync(acc)
            compile_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            for _ in range(5):
                acc, dropped = p3m.p3m_accel_with_overflow(
                    pos, grid=grid, box=2048.0, g_const=70000.0,
                    softening_squared=25.0, near_mode="tree",
                    pair_budget=budget,
                )
            sync(acc)
            ms = (time.perf_counter() - t0) * 1000.0 / 5
            a = np.asarray(acc)
            rms = float(np.sqrt(np.mean((a - a_ex) ** 2)) / scale)
            print(
                f"p3m tree G={grid}: {ms:.1f} ms/accel "
                f"(compile {compile_s:.0f}s, budget {budget}), "
                f"rms_vs_exact={rms:.5f}, dropped_pairs={int(dropped)}, "
                f"speedup_vs_exact={exact_ms/ms:.1f}x",
                flush=True,
            )
        except Exception as ex:  # noqa: BLE001 — keep the sweep going
            print(f"p3m tree G={grid}: FAILED {type(ex).__name__}: {ex}",
                  flush=True)

    # pm_grid context
    from multi_adapter_particles_tpu.ops import pm

    for grid in (64, 128):
        acc = pm.pm_accel(pos, grid=grid, box=2048.0, g_const=70000.0,
                          softening_squared=25.0)
        sync(acc)
        t0 = time.perf_counter()
        for _ in range(5):
            acc = pm.pm_accel(pos, grid=grid, box=2048.0, g_const=70000.0,
                              softening_squared=25.0)
        sync(acc)
        ms = (time.perf_counter() - t0) * 1000.0 / 5
        a = np.asarray(acc)
        rms = float(np.sqrt(np.mean((a - a_ex) ** 2)) / scale)
        print(f"pm_grid G={grid}: {ms:.1f} ms/accel, rms_vs_exact={rms:.5f}",
              flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
