"""Tree-P³M grid sweep at scale — the auto_grid calibration harness.

Measures, on the real chip, tree-mode accel time across mesh sizes on the
two-cluster demo init (the scene whose cluster cores overflow every
static slot capacity). These runs calibrated the `ops/treeforce.py`
auto-grid cost model and pinned its tie-break.

Recorded (v5e fp32, 2026-08-17; ms/accel, RMS vs exact, 0 dropped pairs
everywhere):

    n=262144:  G=96 138.9 | G=128 121.9 (0.080%) | G=160 205.6 (0.075%)
               G=192 282.5 (0.076%) | G=256 563.9 (0.080%)
    n=1048576: G=64 2964.1 (0.116%) | G=128 883.9 (0.083%)
               G=192 688.7 (0.077%) | G=256 881.9 (0.079%)
    exact reference: XLA all-pairs 7574 ms @1M (Pallas kernel: 5719);
    pm_grid @1M: G=64 25.9 ms (3.4% RMS), G=128 54.9 ms (2.4%)

    n=4194304 (ON CHIP 2026-08-19 08:08-08:21 sweep, lane-packed rows +
    SoA sweep accumulator — the f3ef27a/17e48fa code; subsample-exact
    reference, 4096 targets):
      G=192 4411.4 ms/accel (compile 47 s, budget 144236), rms=0.080%,
      dropped=0.
      G=256 3495.9 ms/accel (compile 100 s, budget 113428), rms=0.081%,
      dropped=0 — the measured optimum; 14% faster than the pre-packing
      4081.5 ms (03:29 sweep), ~27x the ~94 s exact dispatch at <0.1%
      error. auto_grid picks 256 on this scene.
      G=384 and G=512 remain INFEASIBLE on the 16 GiB chip, but the
      binding allocation CHANGED: the packed rows killed the 29.0 GB
      [G^3,32]->T(8,128) relayout copy, and the AOT compile now peaks at
      19.21 GiB of HLO temps — the doubled-grid FFT working set (~10
      simultaneously-live (2G)^3-float pruned-rfft buffers,
      f32[768,768,128,6] = 1.69 GiB each, incl. remat copies) vs
      15.75 GiB usable. feasible_grid prices this at ~364 B per G-cell
      (measured 19.21 GiB / 384^3). Sequentializing the per-component
      gradient solves is the lever if G=384 is ever needed — but the
      modeled ~3.6 s there no longer beats the measured 3.50 s at 256.
    n=4194304 (host probe, 2026-08-18; work = post-prune sub-pair
    interactions at sweep granularity, modeled ms from the auto_grid
    cost fit):
      G=128 3.73M sub-pairs (7.8e11 work) ~11.0 s | G=192 1.59M (3.3e11)
      ~5.0 s | G=256 996K (2.1e11) ~3.6 s | G=384 553K (1.2e11) ~3.7 s
      | G=512 429K (9.0e10) ~6.1 s. Sub-block AABB
      pruning buys 1.2x (G=128) to 2.9x (G=512) over coarse block pairs.
      Exact all-pairs at 4M is a ~94 s dispatch (crashes the tunnel
      worker — use the 4096-target subsample below).
    n=16777216 (host probe, 2026-08-18; block 8192, split 16):
      G=128 56.9M sub-pairs (1.2e13) ~165 s | G=192 22.7M (4.8e12)
      ~66 s | G=256 13.0M (2.7e12) ~39 s | G=384 6.0M (1.2e12) ~20 s
      | G=512 3.7M (7.8e11) ~16 s. With the measured G<=256 HBM roof
      (above) single-chip tree-exact at 16.8M costs ~39 s/accel (G=256)
      — pm_grid (549 ms, 16m-pm preset) stays the 16.8M mode; the tree
      showcase tops out at 4M.

Findings (ROADMAP "PM force model" section):
- the grid optimum shifts with N: near-pair work ~N²/G³ vs far field
  ~G³logG — G=128 is optimal at 262K, G=192 at 1M;
- the fitted 3-term cost model ranks configs within ~16% worst case but
  under-prices G=96 @262K (modeled cheaper than G=128, measured 14%
  slower) — hence auto_grid's prefer-larger tie-break within the 20%
  model-noise band;
- the sliced Pallas sweep handles G=64@1M's 1.01M-pair list (2.96 s).

Run DETACHED: nohup python experiments/tree_scaling.py [N] > log 2>&1 &
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

GRIDS = (96, 128, 160, 192, 256)


def main():
    from multi_adapter_particles_tpu.models import init as pinit, integrator
    from multi_adapter_particles_tpu.ops import p3m
    from multi_adapter_particles_tpu.ops.treeforce import (
        auto_grid,
        host_pair_budget,
    )
    from multi_adapter_particles_tpu.utils.timers import sync

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 262_144
    grids = tuple(int(g) for g in sys.argv[2:]) or GRIDS
    print(f"backend={jax.default_backend()} n={n}", flush=True)
    state = pinit.initialize_particles_device(n, seed=42)
    sync(state.position)
    pos = state.position
    pos_host = np.asarray(pos)

    print(f"auto_grid pick: {auto_grid(pos_host, 2048.0, 6.75)}", flush=True)

    if n <= 2_000_000:
        t0 = time.perf_counter()
        a_exact = integrator.all_pairs_accel(
            pos, mass=70000.0, softening_squared=25.0, interaction_scale=1.0
        )
        sync(a_exact)
        print(f"exact accel compile+run: {time.perf_counter()-t0:.0f}s",
              flush=True)
        a_ex = np.asarray(a_exact)
        idx = np.arange(n)
        del a_exact
    else:
        # Subsampled exact reference: K random targets vs ALL sources.
        # The FULL exact step at 4M is a single ~90 s dispatch, which
        # crashed the TPU worker over the tunnel (2026-08-17) — never
        # issue it; the subsample costs <1 s and estimates RMS fine.
        import jax.numpy as jnp

        rng = np.random.default_rng(0)
        idx = np.sort(rng.choice(n, 4096, replace=False))
        t0 = time.perf_counter()
        a_sub = integrator.all_pairs_accel(
            jnp.asarray(pos_host[:, idx]), mass=70000.0,
            softening_squared=25.0, interaction_scale=1.0,
            sources=pos, j_tile=4096,
        )
        sync(a_sub)
        print(f"subsample exact (4096 targets): "
              f"{time.perf_counter()-t0:.0f}s", flush=True)
        a_ex = np.asarray(a_sub)
    scale = np.abs(a_ex).max()

    for grid in grids:
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
            reps = 5 if n <= 2_000_000 else 3
            t0 = time.perf_counter()
            for _ in range(reps):
                acc, dropped = p3m.p3m_accel_with_overflow(
                    pos, grid=grid, box=2048.0, g_const=70000.0,
                    softening_squared=25.0, near_mode="tree",
                    pair_budget=budget,
                )
            sync(acc)
            ms = (time.perf_counter() - t0) * 1000.0 / reps
            a = np.asarray(acc)[:, idx]
            rms = float(np.sqrt(np.mean((a - a_ex) ** 2)) / scale)
            print(
                f"G={grid}: {ms:.1f} ms/accel (compile {compile_s:.0f}s, "
                f"budget {budget}), rms={rms:.5f}, dropped={int(dropped)}",
                flush=True,
            )
            del acc, a
        except Exception as ex:  # noqa: BLE001 — keep the sweep going
            print(f"G={grid} FAILED {type(ex).__name__}: {ex}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
