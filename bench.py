"""Headline benchmark: pairwise interactions/sec/chip, all-pairs force.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline (BASELINE.json north star): 1e12 softened-gravity pairwise
interactions/sec/chip at 1M particles on one TPU chip, fp32.

Timing notes (see .claude/skills/verify/SKILL.md): on the axon tunnel,
`block_until_ready` does not reliably block for Pallas outputs, so every
measurement forces a 1-element host round-trip; steps are chained
(state -> state) so nothing can be skipped.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_PAIRS_PER_SEC = 1.0e12
N = 1_048_576
WARMUP_STEPS = 1
TIMED_STEPS = 3


def main() -> int:
    import jax

    from multi_adapter_particles_tpu.config import SimConfig
    from multi_adapter_particles_tpu.models import init as pinit, integrator
    from multi_adapter_particles_tpu.ops import allpairs
    from multi_adapter_particles_tpu.ops.dispatch import pallas_supported

    n = N
    if jax.default_backend() == "cpu":
        n = 8192  # CI smoke fallback; the driver runs this on real TPU

    cfg = SimConfig(num_particles=n, force_model="all_pairs")
    accel_fn = (
        allpairs.make_accel_fn(
            mass=cfg.mass,
            softening_squared=cfg.softening_squared,
            interaction_scale=cfg.interaction_scale,
        )
        if pallas_supported()
        else None
    )
    step = integrator.make_step(cfg, accel_fn=accel_fn, donate=True)

    state = pinit.initialize_particles_device(n, seed=42)
    np_pad = state.padded_count

    for _ in range(WARMUP_STEPS):
        state = step(state)
    _ = float(jax.device_get(state.position[0, 0]))  # hard sync (see skill)

    t0 = time.perf_counter()
    for _ in range(TIMED_STEPS):
        state = step(state)
    _ = float(jax.device_get(state.position[0, 0]))
    dt = time.perf_counter() - t0

    pairs = float(TIMED_STEPS) * np_pad * np_pad
    pairs_per_sec = pairs / dt
    print(
        json.dumps(
            {
                "metric": f"pairwise interactions/sec/chip @ {n} particles "
                f"(all-pairs softened gravity, fp32)",
                "value": pairs_per_sec,
                "unit": "pairs/s",
                "vs_baseline": pairs_per_sec / BASELINE_PAIRS_PER_SEC,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
