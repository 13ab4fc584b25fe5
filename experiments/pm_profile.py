"""Stage-cost attribution for the FFT particle-mesh force at large grids.

Times deposit / FFT solve+gradient / interpolate separately (each its own
jit with a hard sync), then the fused pm_accel. Targets the VERDICT round-2
item: 4M particles, G=128 step < 300 ms (round 1: 548 ms).

Run on the real chip:  python experiments/pm_profile.py [N] [G]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from multi_adapter_particles_tpu.ops import pm


def main() -> int:
    from multi_adapter_particles_tpu.models import init as pinit
    from multi_adapter_particles_tpu.utils.timers import sync

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4_194_304
    g = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    box = 2048.0
    state = pinit.initialize_particles_device(n, seed=42)
    pos = state.position
    print(f"backend={jax.default_backend()} n={n} grid={g}", flush=True)

    deposit = jax.jit(
        functools.partial(pm.deposit_cic, grid=g, box=box)
    )
    solve = jax.jit(
        functools.partial(
            pm.solve_and_gather, grid=g, box=box, g_const=70000.0,
            softening_squared=25.0,
        )
    )

    @functools.partial(jax.jit, static_argnames=())
    def fft_only(rho):
        g2 = 2 * g
        rho_pad = jnp.zeros((g2, g2, g2), jnp.float32)
        rho_pad = rho_pad.at[:g, :g, :g].set(rho)
        phi = jnp.fft.irfftn(
            jnp.fft.rfftn(rho_pad)
            * pm._potential_kernel_rfft(g, box, 25.0),
            s=(g2, g2, g2),
        )[:g, :g, :g]
        return phi.sum()

    reps = 5
    rho = deposit(pos)
    sync(rho)

    t0 = time.perf_counter()
    for _ in range(reps):
        rho = deposit(pos)
    sync(rho)
    print(f"   deposit: {(time.perf_counter()-t0)*1000/reps:8.2f} ms",
          flush=True)

    s = fft_only(rho)
    float(s)
    t0 = time.perf_counter()
    for _ in range(reps):
        s = fft_only(rho)
    float(s)
    print(f"  fft-only: {(time.perf_counter()-t0)*1000/reps:8.2f} ms",
          flush=True)

    acc = solve(rho, pos)
    sync(acc)
    t0 = time.perf_counter()
    for _ in range(reps):
        acc = solve(rho, pos)
    sync(acc)
    print(f"solve+intp: {(time.perf_counter()-t0)*1000/reps:8.2f} ms",
          flush=True)

    full = jax.jit(
        functools.partial(
            pm.pm_accel, grid=g, box=box, g_const=70000.0,
            softening_squared=25.0,
        )
    )
    acc = full(pos)
    sync(acc)
    t0 = time.perf_counter()
    for _ in range(reps):
        acc = full(pos)
    sync(acc)
    print(f"      full: {(time.perf_counter()-t0)*1000/reps:8.2f} ms",
          flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
