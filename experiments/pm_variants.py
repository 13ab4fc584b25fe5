"""PM deposit/interp variants targeting the measured bottlenecks.

experiments/pm_deposit_profile.py @4M G=128: deposit 383 ms = keys 7.5 +
sort 26.7 + cumsum 2.5 + **searchsorted-over-cells 319** + gather 25;
interp 169 ms = grad 11 + **row-gather 155**. The searchsorted costs
queries*log2(N) serialized gathers — these variants replace it:

1. bincount-bounds: counts = zeros.at[sbase].add(1) then cumsum — one
   scatter-add of N ones over the cell grid instead of ncell searches.
2. direct scatter-add deposit: rho8 = zeros.at[base].add(w8) with NO sort
   at all (XLA sorts internally or serializes collisions — measure).
3. slim sort payloads: carry 3 fracs, derive the 8 corner weights
   post-sort (sort cost is per-operand — see render_variants).
4. interp gather locality: acc32[cid] with ascending vs shuffled cid.

Run on the real chip:  python experiments/pm_variants.py [N] [G]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from multi_adapter_particles_tpu.ops import pm


def timeit(fn, *args, reps=5):
    out = fn(*args)
    jax.tree_util.tree_map(
        lambda x: float(jax.device_get(x.ravel()[0])), out
    )
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.tree_util.tree_map(
        lambda x: float(jax.device_get(x.ravel()[0])), out
    )
    return (time.perf_counter() - t0) * 1000 / reps


def main() -> int:
    from multi_adapter_particles_tpu.models import init as pinit

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4_194_304
    g = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    box = 2048.0
    ncell = g * g * g
    state = pinit.initialize_particles_device(n, seed=42)
    pos = state.position
    print(f"backend={jax.default_backend()} n={n} grid={g}", flush=True)

    # reference deposit for correctness checks
    rho_ref = jax.jit(functools.partial(pm.deposit_cic, grid=g, box=box))(pos)
    rho_ref.block_until_ready()

    # --- 1. bincount bounds --------------------------------------------------
    @jax.jit
    def deposit_bincount(position):
        i0, frac, inside = pm._cic_cells(position, g, box)
        base = i0[2] * g * g + i0[1] * g + i0[0]
        base = jnp.where(inside, base, ncell)
        ws = [jnp.where(inside, w, 0.0) for w in pm._corner_weights(frac)]
        sorted_ops = jax.lax.sort(
            (base, *ws), dimension=0, num_keys=1, is_stable=False
        )
        sbase = sorted_ops[0]
        counts = jnp.zeros(ncell + 1, jnp.int32).at[sbase].add(
            1, mode="drop"
        )
        bounds = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32),
             jnp.cumsum(counts[:-1], dtype=jnp.int32)]
        )  # [ncell+1] exclusive prefix = searchsorted-left equivalent
        sw8 = jnp.stack(sorted_ops[1:], axis=1)
        csum = jnp.concatenate(
            [jnp.zeros((1, 8), jnp.float32), jnp.cumsum(sw8, axis=0)]
        )
        at_bounds = csum[bounds]
        hist8 = at_bounds[1:] - at_bounds[:-1]
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
        return rho

    ms = timeit(deposit_bincount, pos)
    err = float(jnp.abs(deposit_bincount(pos) - rho_ref).max())
    print(f"deposit bincount-bounds: {ms:8.2f} ms (maxerr {err:.2e})",
          flush=True)

    # --- 2. direct scatter-add (no sort) ------------------------------------
    @jax.jit
    def deposit_scatter(position):
        i0, frac, inside = pm._cic_cells(position, g, box)
        base = i0[2] * g * g + i0[1] * g + i0[0]
        base = jnp.where(inside, base, ncell)
        w8 = jnp.stack(
            [jnp.where(inside, w, 0.0) for w in pm._corner_weights(frac)],
            axis=1,
        )
        hist8 = jnp.zeros((ncell + 1, 8), jnp.float32).at[base].add(w8)
        hist8 = hist8[:-1]
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
        return rho

    ms = timeit(deposit_scatter, pos)
    err = float(jnp.abs(deposit_scatter(pos) - rho_ref).max())
    print(f"deposit direct-scatter:  {ms:8.2f} ms (maxerr {err:.2e})",
          flush=True)

    # --- 3. slim sort payloads (3 fracs) + bincount bounds -------------------
    @jax.jit
    def deposit_slim(position):
        i0, frac, inside = pm._cic_cells(position, g, box)
        base = i0[2] * g * g + i0[1] * g + i0[0]
        base = jnp.where(inside, base, ncell)
        fx = jnp.where(inside, frac[0], 0.0)
        fy = jnp.where(inside, frac[1], 0.0)
        fz = jnp.where(inside, frac[2], 0.0)
        live = inside.astype(jnp.float32)
        sbase, sfx, sfy, sfz, slive = jax.lax.sort(
            (base, fx, fy, fz, live), dimension=0, num_keys=1,
            is_stable=False,
        )
        ws = []
        for dz in (0, 1):
            for dy in (0, 1):
                for dx in (0, 1):
                    ws.append(
                        slive
                        * (sfx if dx else 1.0 - sfx)
                        * (sfy if dy else 1.0 - sfy)
                        * (sfz if dz else 1.0 - sfz)
                    )
        counts = jnp.zeros(ncell + 1, jnp.int32).at[sbase].add(
            1, mode="drop"
        )
        bounds = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32),
             jnp.cumsum(counts[:-1], dtype=jnp.int32)]
        )
        sw8 = jnp.stack(ws, axis=1)
        csum = jnp.concatenate(
            [jnp.zeros((1, 8), jnp.float32), jnp.cumsum(sw8, axis=0)]
        )
        at_bounds = csum[bounds]
        hist8 = at_bounds[1:] - at_bounds[:-1]
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
        return rho

    ms = timeit(deposit_slim, pos)
    err = float(jnp.abs(deposit_slim(pos) - rho_ref).max())
    print(f"deposit slim-sort:       {ms:8.2f} ms (maxerr {err:.2e})",
          flush=True)

    # --- 4. interp gather locality ------------------------------------------
    rng = np.random.default_rng(0)
    acc32 = jnp.asarray(
        rng.uniform(-1, 1, (ncell, 32)).astype(np.float32)
    )
    i0, _, _ = pm._cic_cells(pos, g, box)
    i0c = jnp.clip(i0, 0, g - 2)
    cid = i0c[2] * g * g + i0c[1] * g + i0c[0]
    cid_sorted = jnp.sort(cid)
    cid_shuf = jnp.asarray(
        rng.permutation(np.asarray(cid))
    )

    f = jax.jit(lambda t, idx: t[idx].sum())
    for name, idx in (("as-is", cid), ("ascending", cid_sorted),
                      ("shuffled", cid_shuf)):
        ms = timeit(f, acc32, idx)
        print(f"interp 32f-row gather ({name:>9}): {ms:8.2f} ms", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
