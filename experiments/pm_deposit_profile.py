"""Stage attribution inside the PM deposit and interpolation paths.

Round-2 history @4M/G=128 on one v5e:
- The ORIGINAL step was deposit-bound (383 ms of 553) and this profile
  pinned it on `jnp.searchsorted` (320 ms — G³ binary searches over N
  sorted keys). The merge-by-sort bounds (ops/pm.py `_segment_bounds`)
  replaced it: deposit 383 -> ~72 ms.
- The interp acc32 row-gather (153 ms fp32 in particle order) measured
  NO faster issued in cell-sorted ascending order (160 ms + a 13 ms
  payload-sort un-permute) — the cost is per-row-byte, not locality.
  bf16 rows (64 B) were tried and REVERTED: trilinear interpolation at a
  particle's own position depends on cancellation of its steep self-field
  across the 8 corners, and half-precision storage broke it (7.5%
  two-body far-field error). The gather stays particle-order fp32.

NOTE: the interp stages here still issue the PLAIN narrow gather; the
production path (`pm._interp`) now goes through the lane-packed
`ops/rowgather.gather_rows` with fused gather+weight chunking — use the
end-to-end pm_accel number below as the production figure (152.5 ms
@4M/G=128 on v5e) and these stages for structure attribution only.

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
    ncell = g * g * g
    sbase, sfrac = pm._sort_by_cell(position, grid, box)
    if stage == "sort":
        return sbase.sum() + sum(f.sum() for f in sfrac)

    bounds = pm._segment_bounds(sbase, ncell)
    if stage == "bounds":
        return bounds.sum() + sbase.sum()

    live = sbase < ncell
    sw8 = jnp.stack(
        [jnp.where(live, w, 0.0) for w in pm._corner_weights(sfrac)], axis=1
    )
    csum = jnp.concatenate(
        [jnp.zeros((1, 8), jnp.float32), jnp.cumsum(sw8, axis=0)]
    )
    at_bounds = csum[bounds]
    hist8 = at_bounds[1:] - at_bounds[:-1]
    if stage == "cumsum+gather":
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


@functools.partial(jax.jit, static_argnames=("grid", "box", "stage"))
def _interp_upto(rho, position, grid, box, stage):
    g = grid
    acc32 = pm._accel_rows(rho, g, box, 70000.0, 25.0)
    if stage == "grad+pack":
        return acc32.astype(jnp.float32).sum()

    i0, frac, inside = pm._cic_cells(position, g, box)
    i0c = jnp.clip(i0, 0, g - 2)
    cid = i0c[2] * g * g + i0c[1] * g + i0c[0]
    rows = acc32[cid].astype(jnp.float32).reshape(position.shape[1], 8, 4)
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
    for stage in ("sort", "bounds", "cumsum+gather", "full"):
        out = _deposit_upto(pos, g, box, stage)
        float(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = _deposit_upto(pos, g, box, stage)
        float(out)
        ms = (time.perf_counter() - t0) * 1000 / reps
        print(f"deposit {stage:>13}: {ms:8.2f} ms cumulative (+{ms - prev:7.2f})",
              flush=True)
        prev = ms

    rho = jax.jit(functools.partial(pm.deposit_cic, grid=g, box=box))(pos)
    float(rho[0, 0, 0])
    prev = 0.0
    for stage in ("grad+pack", "rowgather", "full"):
        out = _interp_upto(rho, pos, g, box, stage)
        float(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = _interp_upto(rho, pos, g, box, stage)
        float(out)
        ms = (time.perf_counter() - t0) * 1000 / reps
        print(f"interp  {stage:>13}: {ms:8.2f} ms cumulative (+{ms - prev:7.2f})",
              flush=True)
        prev = ms

    # end-to-end pm_accel
    f = jax.jit(functools.partial(
        pm.pm_accel, grid=g, box=box, g_const=70000.0,
        softening_squared=25.0))
    acc = f(pos)
    float(acc[0, 0])
    t0 = time.perf_counter()
    for _ in range(reps):
        acc = f(pos)
    float(acc[0, 0])
    ms = (time.perf_counter() - t0) * 1000 / reps
    print(f"pm_accel end-to-end: {ms:8.2f} ms", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
