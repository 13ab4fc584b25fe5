"""Stage attribution inside the PM deposit and interpolation paths.

Round-2 finding: at 4M/G=128 the step is deposit-bound (383 ms of 553),
with interpolation second (~150 ms) and the FFT irrelevant (13 ms).
This breaks the deposit into keys / sort / cumsum / bounds / gather and
the interp into grad / pack / gather to find the real cost.

Run on the real chip:  python experiments/pm_deposit_profile.py [N] [G]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from multi_adapter_particles_tpu.ops import pm


@functools.partial(jax.jit, static_argnames=("grid", "box", "stage"))
def _deposit_upto(position, grid, box, stage):
    g = grid
    i0, frac, inside = pm._cic_cells(position, grid, box)
    ncell = g * g * g
    base = i0[2] * g * g + i0[1] * g + i0[0]
    base = jnp.where(inside, base, ncell)
    ws = [jnp.where(inside, w, 0.0) for w in pm._corner_weights(frac)]
    if stage == "keys":
        return base.sum() + sum(w.sum() for w in ws)

    sorted_ops = jax.lax.sort(
        (base, *ws), dimension=0, num_keys=1, is_stable=False
    )
    sbase = sorted_ops[0]
    if stage == "sort":
        return sbase.sum() + sum(o.sum() for o in sorted_ops[1:])

    sw8 = jnp.stack(sorted_ops[1:], axis=1)
    csum = jnp.concatenate(
        [jnp.zeros((1, 8), jnp.float32), jnp.cumsum(sw8, axis=0)]
    )
    if stage == "cumsum":
        return csum[-1].sum() + sbase.sum()

    bounds = jnp.searchsorted(
        sbase, jnp.arange(ncell + 1, dtype=jnp.int32), side="left"
    )
    if stage == "bounds":
        return bounds.sum() + csum[-1].sum()

    at_bounds = csum[bounds]
    hist8 = at_bounds[1:] - at_bounds[:-1]
    if stage == "gather":
        return hist8.sum()

    rho = jnp.zeros((g, g, g), jnp.float32)
    corner = 0
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                hist = hist8[:, corner].reshape(g, g, g)
                rho = rho.at[dz:g, dy:g, dx:g].add(
                    hist[: g - dz, : g - dy, : g - dx]
                )
                corner += 1
    return rho.sum()


@functools.partial(
    jax.jit, static_argnames=("grid", "box", "stage")
)
def _interp_upto(rho, position, grid, box, stage):
    g = grid
    h = box / g
    phi = pm._convolve_pruned(
        rho, pm._potential_kernel_rfft(g, box, 25.0), g
    ) * jnp.float32(70000.0)
    inv2h = jnp.float32(1.0 / (2.0 * h))
    zero = jnp.zeros_like(phi)
    ax = zero.at[:, :, 1:-1].set((phi[:, :, :-2] - phi[:, :, 2:]) * inv2h)
    ay = zero.at[:, 1:-1, :].set((phi[:, :-2, :] - phi[:, 2:, :]) * inv2h)
    az = zero.at[1:-1, :, :].set((phi[:-2, :, :] - phi[2:, :, :]) * inv2h)
    if stage == "grad":
        return ax.sum() + ay.sum() + az.sum()

    a4 = jnp.stack([ax, ay, az, jnp.zeros_like(ax)], axis=-1)
    a4p = jnp.pad(a4, ((0, 1), (0, 1), (0, 1), (0, 0)))
    corners = [
        a4p[dz:dz + g, dy:dy + g, dx:dx + g].reshape(g * g * g, 4)
        for dz in (0, 1) for dy in (0, 1) for dx in (0, 1)
    ]
    acc32 = jnp.concatenate(corners, axis=1)
    if stage == "pack":
        return acc32.sum()

    i0, frac, inside = pm._cic_cells(position, g, box)
    i0c = jnp.clip(i0, 0, g - 2)
    cid = i0c[2] * g * g + i0c[1] * g + i0c[0]
    rows = acc32[cid].reshape(position.shape[1], 8, 4)
    if stage == "rowgather":
        return rows.sum()

    w8 = jnp.stack(pm._corner_weights(frac), axis=1)
    acc = jnp.sum(rows * w8[:, :, None], axis=1)
    return jnp.where(inside[None, :], acc[:, :3].T, 0.0).sum()


def main() -> int:
    from multi_adapter_particles_tpu.models import init as pinit

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4_194_304
    g = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    box = 2048.0
    reps = 5
    state = pinit.initialize_particles_device(n, seed=42)
    pos = state.position
    print(f"backend={jax.default_backend()} n={n} grid={g}", flush=True)

    prev = 0.0
    for stage in ("keys", "sort", "cumsum", "bounds", "gather", "full"):
        out = _deposit_upto(pos, g, box, stage)
        float(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = _deposit_upto(pos, g, box, stage)
        float(out)
        ms = (time.perf_counter() - t0) * 1000 / reps
        print(f"deposit {stage:>7}: {ms:8.2f} ms cumulative (+{ms - prev:7.2f})",
              flush=True)
        prev = ms

    rho = jax.jit(functools.partial(pm.deposit_cic, grid=g, box=box))(pos)
    float(rho[0, 0, 0])
    prev = 0.0
    for stage in ("grad", "pack", "rowgather", "full"):
        out = _interp_upto(rho, pos, g, box, stage)
        float(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = _interp_upto(rho, pos, g, box, stage)
        float(out)
        ms = (time.perf_counter() - t0) * 1000 / reps
        print(f"interp  {stage:>9}: {ms:8.2f} ms cumulative (+{ms - prev:7.2f})",
              flush=True)
        prev = ms
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
