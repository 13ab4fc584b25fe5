"""Attribution for the halved tree force sweep: what does the j-side
actually cost?

The 262K landing measured -9.2% where Newton-3rd symmetry ideally
gives ~2x on the pair math. This harness separates the halved sweep's
components by timing a measurement-only kernel variant with the j-side
block removed (i-side lane reductions over the HALVED pair list only —
produces WRONG forces, roughly half the field, but its runtime is the
ideal ceiling of the halved schedule: all pair math exactly once, no
sublane reductions, no banded-accumulator RMW, no per-iteration
predication).

  directed D     : full pair math twice per unordered pair
  halved   H     : math once + j-side (production, correct)
  i-only   I     : math once, no j-side (wrong results, ceiling timing)

  j-side overhead = H - I;  headroom left on the table = H - I vs D - H.

The variant kernel lives HERE (monkeypatched over
`treeforce._sweep_kernel_n3`), keeping production free of
measurement-only knobs — the experiments dir is where variant kernels
go (allpairs_*.py precedent).

Run DETACHED:
  nohup python experiments/tree_halfforce_overhead.py \
      > /tmp/tree_half_ovh.log 2>&1 &

RESULTS (on-chip v5e, 2026-08-21, 262K demo G=128, budget 85451):

  directed          127.0 ms/accel   (second run; 130.4/128.1 earlier
  halved (prod)     119.2             same-day — tunnel-noise band)
  i-side only       118.7             (j-side deleted — ceiling timing)
  no-sweep floor     65.0             (pair_budget=2: far field +
                                       Morton sort + adjacency walk +
                                       compaction + un-sort intact)

  sweep portion: directed 62.0 -> halved 54.2 ms
  j-side overhead H - I = 0.5 ms — the j-side is FREE (hidden in the
  kernel's VLIW/DMA slack), NOT the limiter.
  halving captured 94% of its structural ceiling (D - I).

ATTRIBUTION REVISED vs the first docstring read in tree_halfforce.py:
the halved win is small not because the j-side eats it but because the
sweep at this shape is DMA-LATENCY-bound, not pair-math-bound —
~0.9 us/pair directed (68K live pairs / 62 ms) against ~0.3 us of
B=256 pair math, and the halved schedule's shorter per-target segments
(~42 vs ~83 pairs against the 8-deep ring) push it to ~1.6 us/pair.
Halving wins by issuing HALF THE DMAs, not half the math. Next levers
for this axis, in measured order: (a) the 65 ms pair-count-insensitive
pipeline (far field ~35 ms + adjacency/sorts ~25); (b) coalescing
consecutive-j source copies into wider DMAs (Morton order makes
spatial neighbors index-adjacent, so pair lists are runs of
consecutive j) — both untouched by Newton-3rd symmetry.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _sweep_kernel_n3_iside(
    bounds_ref, jidx_ref, spos_hbm, pos_i, iacc_out, jacc_out,
    buf, jacc, sem, *, block, kb, band_lo, eps2, sigma,
):
    """_sweep_kernel_n3 with the j-side block DELETED — wrong physics,
    ceiling timing (see module docstring)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from multi_adapter_particles_tpu.ops.treeforce import (
        _RING, short_factor_cheb,
    )

    i = pl.program_id(0)
    s = bounds_ref[i]
    e = bounds_ref[i + 1]

    @pl.when(i == 0)
    def _():
        jacc[...] = jnp.zeros_like(jacc)

    i0 = jax.lax.broadcasted_iota(jnp.int32, (block, block), 0)
    i1 = jax.lax.broadcasted_iota(jnp.int32, (block, block), 1)
    d01 = (i0 - i1) * (i0 - i1)
    eye = jnp.where(d01 > 0, jnp.float32(0.0), jnp.float32(1.0))

    def _col(row):
        return jnp.sum(eye * row, axis=1, keepdims=True)

    def _row(col):
        return jnp.sum(eye * col, axis=0, keepdims=True)

    xi = _col(pos_i[0:1, :])
    yi = _col(pos_i[1:2, :])
    zi = _col(pos_i[2:3, :])

    def jof(t):
        word = jidx_ref[t >> 1]
        return jax.lax.shift_right_logical(
            word, (t & 1) * 16
        ) & jnp.int32(0xFFFF)

    def dma(slot, t):
        return pltpu.make_async_copy(
            spos_hbm.at[:, pl.ds(jof(t) * block, block)],
            buf.at[slot], sem.at[slot])

    def body(t, acc):
        ax, ay, az = acc
        slot = jax.lax.rem(t - s, _RING)

        @pl.when(t + _RING - 1 < e)
        def _():
            dma(jax.lax.rem(t - s + _RING - 1, _RING), t + _RING - 1).start()

        dma(slot, t).wait()
        tile = buf[slot]
        dx = tile[0:1, :] - xi
        dy = tile[1:2, :] - yi
        dz = tile[2:3, :] - zi
        d2 = dx * dx + dy * dy + dz * dz
        f = short_factor_cheb(d2, eps2, jnp.float32(sigma))
        return (
            ax + jnp.sum(dx * f, axis=1, keepdims=True),
            ay + jnp.sum(dy * f, axis=1, keepdims=True),
            az + jnp.sum(dz * f, axis=1, keepdims=True),
        )

    zero = jnp.zeros((block, 1), jnp.float32)
    for r in range(_RING - 1):
        @pl.when(s + r < e)
        def _(r=r):
            dma(jnp.int32(r), s + r).start()

    ax, ay, az = jax.lax.fori_loop(s, e, body, (zero, zero, zero))
    iacc_out[:, :] = jnp.concatenate(
        [_row(ax), _row(ay), _row(az),
         jnp.zeros((1, block), jnp.float32)], axis=0)

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        jacc_out[...] = jacc[...]


def main():
    from multi_adapter_particles_tpu.models import init as pinit
    from multi_adapter_particles_tpu.ops import p3m, treeforce
    from multi_adapter_particles_tpu.ops.treeforce import host_pair_budget
    from multi_adapter_particles_tpu.utils import compilecache

    compilecache.enable("auto")
    n, grid, box, cutoff = 262_144, 128, 2048.0, 6.75
    print(f"backend={jax.default_backend()} n={n} G={grid}", flush=True)
    state = pinit.initialize_particles_device(n, seed=42)
    _ = float(np.asarray(jax.device_get(state.position[0, 0])))
    pos = state.position
    g_const = 70000.0 / n
    r_c = cutoff * box / grid
    gn = max(int(box // r_c), 1)
    budget = host_pair_budget(np.asarray(pos), box, r_c, gn)
    print(f"budget={budget}", flush=True)

    def bench(label, half, budget_=None):
        fn = jax.jit(lambda p, h=half, b=budget_ or budget: p3m.p3m_accel(
            p, grid=grid, box=box, g_const=g_const,
            softening_squared=25.0, cutoff_cells=cutoff,
            near_mode="tree", pair_budget=b, half_force=h,
        ))
        t0 = time.perf_counter()
        a = fn(pos)
        _ = float(a[0, 0])
        print(f"{label} first (compile) {time.perf_counter()-t0:6.1f} s",
              flush=True)
        reps = 5
        t0 = time.perf_counter()
        for _i in range(reps):
            a = fn(pos)
            _ = float(a[0, 0])
        ms = (time.perf_counter() - t0) * 1000.0 / reps
        print(f"{label} {ms:9.1f} ms/accel", flush=True)
        return ms

    d = bench("directed        ", False)
    h = bench("halved (prod)   ", True)
    # everything-but-the-sweep floor: a 2-pair budget empties the sweep
    # while the far field, Morton sort, adjacency walk, compaction and
    # un-sort all still run (dropped pairs expected — timing only)
    f = bench("no-sweep floor  ", False, budget_=2)
    treeforce._sweep_kernel_n3 = _sweep_kernel_n3_iside
    i = bench("i-side only     ", True)
    print(f"\nD={d:.1f}  H={h:.1f}  I={i:.1f}  floor F={f:.1f}", flush=True)
    print(f"sweep portion: directed {d-f:.1f} ms -> halved {h-f:.1f} ms; "
          f"j-side overhead H-I = {h-i:.1f} ms; halving won D-H = "
          f"{d-h:.1f} of the D-I = {d-i:.1f} ceiling "
          f"({(d-h)/max(d-i,1e-9):.0%})", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
