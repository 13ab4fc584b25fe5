"""Newton-3rd halved tree-P³M FORCE sweep (round 5) — on-chip A/B.

The directed sweep pays the full ~33-op pair math (rsqrt + 12-FMA
Horner + cutoff clamp + 3 accumulate chains) TWICE per unordered block
pair — once from each side. `_sweep_kernel_n3` computes each pair plane
once and applies it to both sides: i-side lane reductions (unchanged)
plus j-side negated sublane reductions into a persistent banded VMEM
accumulator (the `ops/allpairs.py` half-pair v7 structure steered by
the dual-tree pair list). Gate: Pallas, native sweep width (block <=
512, i.e. N <= ~1M demo scenes), single-SMEM-slice pair list, single
device.

This harness A/Bs on the demo init at N (argv[1], default 262144),
auto-grid G (argv[2], default 128 @262K / 192 @1M):
  - directed sweep accel ms (production until round 5)
  - halved sweep accel ms (`half_force=True`, the new default)
  - both RMS vs the exact all-pairs accel on a 4096-target subsample
    (same accuracy class expected: the pair SET is identical)
  - p3m tree step ms through the integrator (the preset hot path)

Run DETACHED (verify skill: never timeout-kill a TPU job):
  nohup python experiments/tree_halfforce.py > /tmp/tree_half.log 2>&1 &
  nohup python experiments/tree_halfforce.py 1048576 192 \
      > /tmp/tree_half_1m.log 2>&1 &

RESULTS (on-chip v5e, 2026-08-21):

  262K demo, G=128 (budget 85451; B=256, ONE band):
    directed   130.4 ms/accel   RMS vs exact 0.0838%
    halved     118.4 ms/accel   RMS vs exact 0.0838%   (-9.2%)
    halved vs directed max rel: 2.04e-07
  1M demo, G=192 (budget 144326; B=512 -> kb=256, EIGHT bands):
    directed   596.1 ms/accel   RMS vs exact 0.0798%
    halved     734.8 ms/accel   RMS vs exact 0.0798%   (+23% — REJECTED
    at this shape; also the first 4 MB-band attempt OOM'd scoped VMEM,
    18.32M > 16M: the band is paid twice, scratch + output block)

-9% net at 262K. ATTRIBUTION (tree_halfforce_overhead.py, same day):
the j-side is FREE (i-side-only variant times identical, 118.7 vs
119.2) — the sweep at this shape is DMA-LATENCY-bound (~0.9 us/pair
vs ~0.3 us of math), sitting on a 65 ms pair-count-insensitive
pipeline (far field + adjacency/sorts). Halving wins by issuing half
the DMAs and captures 94% of its structural ceiling; the earlier
"j-side reductions eat the 2x" reading was WRONG.
The 1M REGRESSION is structural: banding splits each target's pair
stream nbands ways, and at 8 bands the average (band, target) segment
is ~4 pairs against the 8-deep latency-bound DMA ring — the pipeline
never fills. PRODUCTION GATE: `_N3_MAX_BANDS = 2` (static), so 262K
runs halved (-9%) and 1M falls back to the directed sweep bitwise.
Accuracy is IDENTICAL to the directed sweep's (same pair set; 2e-7
accumulation divergence), so the free ~10% lands as the single-chip
default where the gate admits it (`SimConfig.tree_half_force`,
`-treedirected` restores). The known structural fix for wide shapes —
a rolling j-window flushing block i's accumulator row through target
i's own output block (single segment per target, no bands) with an
out-of-window directed residual list — is designed but unbuilt
(ROADMAP).

Pass a third argv "fast" to skip the exact-subsample reference
(gate-confirmation runs).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from multi_adapter_particles_tpu.models import init as pinit
    from multi_adapter_particles_tpu.ops import p3m
    from multi_adapter_particles_tpu.ops.treeforce import host_pair_budget
    from multi_adapter_particles_tpu.utils import compilecache

    compilecache.enable("auto")
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 262_144
    grid = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    print(f"backend={jax.default_backend()} n={n} G={grid}", flush=True)
    state = pinit.initialize_particles_device(n, seed=42)
    _ = float(np.asarray(jax.device_get(state.position[0, 0])))
    pos = state.position
    box, cutoff = 2048.0, 6.75
    g_const = 70000.0 / n
    r_c = cutoff * box / grid
    gn = max(int(box // r_c), 1)
    budget = host_pair_budget(np.asarray(pos), box, r_c, gn)
    print(f"budget={budget}", flush=True)

    # exact reference on a subsample (chunked: K targets vs all sources;
    # a_i = g * sum_j (p_j - p_i) / d2^{3/2}, the j == i numerator is 0)
    fast = len(sys.argv) > 3 and sys.argv[3] == "fast"
    k = 4096
    a_ex = None
    if not fast:
        p3_np = np.asarray(pos[:3]).astype(np.float64)
        ck = max(8, (1 << 25) // n)
        parts = []
        for lo in range(0, k, ck):
            tgt = p3_np[:, lo:lo + ck]
            d = tgt[:, :, None] - p3_np[:, None, :]   # p_i - p_j
            d2 = (d * d).sum(0) + 25.0
            parts.append(-(d * (1.0 / d2 ** 1.5)[None]).sum(2) * g_const)
        a_ex = np.concatenate(parts, axis=1)
        scale = np.abs(a_ex).max()
        print("exact subsample ready", flush=True)

    accs = {}
    for label, half in (("directed", False), ("halved  ", True)):
        fn = jax.jit(lambda p, h=half: p3m.p3m_accel(
            p, grid=grid, box=box, g_const=g_const,
            softening_squared=25.0, cutoff_cells=cutoff,
            near_mode="tree", pair_budget=budget, half_force=h,
        ))
        t0 = time.perf_counter()
        a = fn(pos)
        _ = float(a[0, 0])
        print(f"{label} first (compile) {time.perf_counter()-t0:7.1f} s",
              flush=True)
        reps = 5
        t0 = time.perf_counter()
        for _i in range(reps):
            a = fn(pos)
            _ = float(a[0, 0])
        ms = (time.perf_counter() - t0) * 1000.0 / reps
        av = np.asarray(a)
        accs[label] = av
        if a_ex is None:
            print(f"{label} {ms:9.1f} ms/accel", flush=True)
        else:
            rms = float(np.sqrt(np.mean((av[:, :k] - a_ex) ** 2)) / scale)
            print(f"{label} {ms:9.1f} ms/accel   RMS vs exact {rms:.4%}",
                  flush=True)

    dd = np.abs(accs["halved  "] - accs["directed"]).max() / np.abs(
        accs["directed"]).max()
    print(f"halved vs directed max rel: {dd:.2e}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
