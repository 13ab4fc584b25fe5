"""On-chip validation of the round-3 memory-layout chain (2026-08-19):

1. tree-P3M accel @262K demo init, G=128 — the SoA sweep kernel
   ([4, nb*B] targets/output + one-hot block transposes; was [nb*B, 4]
   lane-padded 32x). Expect ~121 ms/accel and 0.080% RMS vs exact
   (the pre-change anchors) — bitwise identity is NOT expected (the
   un-sort payload order changed shape), accuracy parity is.
2. pm_grid accel @1M, G=128 — the directly-packed [G³/4, 128] corner
   rows (pm._pack_corner_rows; was a [G³, 32] relayout). Expect
   ~25/55 ms (G=64/128 anchors) and bitwise equality with... (CPU
   cross-check runs in tests; here: finite + magnitude sanity).

Run DETACHED: nohup python experiments/onchip_check_r3c.py > log 2>&1 &
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def main():
    from multi_adapter_particles_tpu.models import init as pinit, integrator
    from multi_adapter_particles_tpu.ops import p3m, pm
    from multi_adapter_particles_tpu.ops.treeforce import host_pair_budget
    from multi_adapter_particles_tpu.utils.timers import sync

    print(f"backend={jax.default_backend()}", flush=True)

    # --- tree sweep @262K ---------------------------------------------------
    n = 262_144
    state = pinit.initialize_particles_device(n, seed=42)
    sync(state.position)
    pos = state.position
    pos_host = np.asarray(pos)
    t0 = time.perf_counter()
    a_exact = integrator.all_pairs_accel(
        pos, mass=70000.0, softening_squared=25.0, interaction_scale=1.0
    )
    sync(a_exact)
    print(f"exact @262K: {time.perf_counter()-t0:.0f}s", flush=True)
    a_ex = np.asarray(a_exact)
    scale = np.abs(a_ex).max()

    grid, box = 128, 2048.0
    r_c = 6.75 * box / grid
    gn = max(int(box // r_c), 1)
    budget = host_pair_budget(pos_host, box, r_c, gn)
    t0 = time.perf_counter()
    acc, dropped = p3m.p3m_accel_with_overflow(
        pos, grid=grid, box=box, g_const=70000.0,
        softening_squared=25.0, near_mode="tree", pair_budget=budget,
    )
    sync(acc)
    print(f"tree compile+run: {time.perf_counter()-t0:.0f}s", flush=True)
    t0 = time.perf_counter()
    for _ in range(5):
        acc, dropped = p3m.p3m_accel_with_overflow(
            pos, grid=grid, box=box, g_const=70000.0,
            softening_squared=25.0, near_mode="tree", pair_budget=budget,
        )
    sync(acc)
    ms = (time.perf_counter() - t0) * 1000.0 / 5
    rms = float(np.sqrt(np.mean((np.asarray(acc) - a_ex) ** 2)) / scale)
    print(
        f"tree G=128 @262K: {ms:.1f} ms/accel rms={rms:.5f} "
        f"dropped={int(dropped)}  [anchors: 121 ms, 0.00080]",
        flush=True,
    )

    # --- packed PM rows @1M ---------------------------------------------------
    n = 1_048_576
    state = pinit.initialize_particles_device(n, seed=42)
    sync(state.position)
    pos = state.position
    for g in (64, 128):
        t0 = time.perf_counter()
        a = pm.pm_accel(pos, grid=g, box=2048.0, g_const=70000.0,
                        softening_squared=25.0)
        sync(a)
        c = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(10):
            a = pm.pm_accel(pos, grid=g, box=2048.0, g_const=70000.0,
                            softening_squared=25.0)
        sync(a)
        ms = (time.perf_counter() - t0) * 1000.0 / 10
        ah = np.asarray(a)
        assert np.isfinite(ah).all()
        print(
            f"pm G={g} @1M: {ms:.1f} ms/accel (compile {c:.0f}s) "
            f"|a|max={np.abs(ah).max():.3e}  [anchors: 25.9/54.9 ms]",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
