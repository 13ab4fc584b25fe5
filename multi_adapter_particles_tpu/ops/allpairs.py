"""Blocked all-pairs gravity force as a Pallas TPU kernel.

This is the TPU rebuild of the tiled O(N^2) force the demo's lineage points
at: the Microsoft original staged particle tiles through groupshared memory
and accumulated `bodyBodyInteraction` (`nBodyGravityCS.hlsl:44-57`) over all
tiles. Here the analog of groupshared memory is VMEM:

- The grid walks i-tiles (the particles whose acceleration we produce),
  delivered as [TI, 4] row blocks of the transposed positions so that each
  coordinate is directly a [TI, 1] sublane column.
- For each i-tile, j-tiles of source positions stream HBM -> VMEM as
  [4, TJ] lane slices through a double-buffered async-copy pipeline (DMA of
  tile j+1 overlaps force math on tile j) — the copy-queue-overlaps-compute
  idea (`Render.cpp:789-831`) applied *inside* the chip.
- Pairwise planes are [TI, TJ]: i down sublanes, j across lanes; the
  per-component accumulation is a lane-axis reduction producing [TI, 1]
  columns carried through the j-loop in registers.

Padding particles are parked at 1e9 (see `models/state.py`); pad-pad pairs
have r = 0 (identical positions -> zero force) and pad-real forces are
O(1e-14), so no mask is needed in the hot loop.

Self-interaction contributes exactly zero (r_ii = 0), matching the upstream
shader which never special-cases i == j.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multi_adapter_particles_tpu.ops.dispatch import interpret_flag

# Default tile sizes. VMEM at (TI=256, TJ=2048): each [TI, TJ] f32 plane is
# 2 MiB; the fused expression keeps ~5 planes live => ~10 MiB peak, inside
# the 16 MiB/core scoped-vmem budget ((1024,1024)/(2048,256) fail to
# compile; measured sweep on v5e: (256,2048) 0.168 Tpairs/s vs (512,1024)
# 0.159, (1024,512) 0.109). The j-stream buffers are tiny (2 x 4 x TJ).
DEFAULT_TI = 256
DEFAULT_TJ = 2048


def _allpairs_kernel(
    pos_hbm,    # [4, Np] in ANY/HBM — j-stream, sliced manually
    posT_i,     # [TI, 4] VMEM block for this grid step (x, y, z, w columns)
    accel_out,  # [TI, 4] VMEM output block (ax, ay, az, |a|)
    buf,        # [4, 4, TJ] VMEM scratch — double-buffered PAIRS of j tiles
    sem,        # [4] DMA semaphores
    *,
    num_j_tiles: int,
    tj: int,
    mass_scale: float,
    eps2: float,
):
    ti = posT_i.shape[0]
    xi = posT_i[:, 0:1]  # [TI, 1]
    yi = posT_i[:, 1:2]
    zi = posT_i[:, 2:3]

    def dma(slot, j):
        return pltpu.make_async_copy(
            pos_hbm.at[:, pl.ds(j * tj, tj)],
            buf.at[slot],
            sem.at[slot],
        )

    def tile_force(tile, acc):
        ax, ay, az = acc
        xj = tile[0:1, :]     # [1, TJ]
        yj = tile[1:2, :]
        zj = tile[2:3, :]
        dx = xj - xi          # [TI, TJ]
        dy = yj - yi
        dz = zj - zi
        d2 = dx * dx + dy * dy + dz * dz + jnp.float32(eps2)
        inv = jax.lax.rsqrt(d2)
        s = inv * inv * inv   # 1 / d^3  (mass applied once at the end)
        return (
            ax + jnp.sum(dx * s, axis=1, keepdims=True),
            ay + jnp.sum(dy * s, axis=1, keepdims=True),
            az + jnp.sum(dz * s, axis=1, keepdims=True),
        )

    zero = jnp.zeros((ti, 1), jnp.float32)
    num_pairs = num_j_tiles // 2

    # Two tiles per iteration feeding two INDEPENDENT accumulator chains:
    # the reductions of tile 2k don't serialize against tile 2k+1, giving
    # the VPU overlapping dependency chains (+4% measured; bit-identical
    # up to the final pairwise add).
    def body(p, carry):
        a0, a1 = carry[:3], carry[3:]
        base = jax.lax.rem(p, 2) * 2

        @pl.when(p + 1 < num_pairs)
        def _():
            nxt = (1 - jax.lax.rem(p, 2)) * 2
            dma(nxt, (p + 1) * 2).start()
            dma(nxt + 1, (p + 1) * 2 + 1).start()

        dma(base, p * 2).wait()
        dma(base + 1, p * 2 + 1).wait()
        a0 = tile_force(buf[base], a0)
        a1 = tile_force(buf[base + 1], a1)
        return (*a0, *a1)

    if num_pairs:
        dma(0, 0).start()
        dma(1, 1).start()
        acc = jax.lax.fori_loop(
            0, num_pairs, body, (zero, zero, zero, zero, zero, zero)
        )
        a0, a1 = acc[:3], acc[3:]
    else:
        a0 = (zero, zero, zero)
        a1 = (zero, zero, zero)

    if num_j_tiles % 2:
        # odd tail tile, un-overlapped (only reachable for non-pow2 tile
        # counts; the free ring half is idle by now)
        free = ((num_pairs % 2) * 2) if num_pairs else 0
        dma(free, num_j_tiles - 1).start()
        dma(free, num_j_tiles - 1).wait()
        a0 = tile_force(buf[free], a0)

    m = jnp.float32(mass_scale)
    ax = (a0[0] + a1[0]) * m
    ay = (a0[1] + a1[1]) * m
    az = (a0[2] + a1[2]) * m
    amag = jnp.sqrt(ax * ax + ay * ay + az * az)
    accel_out[:, :] = jnp.concatenate([ax, ay, az, amag], axis=1)


from multi_adapter_particles_tpu.ops.dispatch import pick_tile as _pick_tile


def _pick(n: int, want: int) -> int:
    # i-tiles live on sublanes (8-aligned); j-tiles are DMA lane slices
    # (128-aligned) — both constraints satisfied by 128 alignment here
    return _pick_tile(n, want, 128)


@functools.partial(
    jax.jit,
    static_argnames=("mass", "softening_squared", "interaction_scale", "ti", "tj"),
)
def all_pairs_accel_pallas(
    position: jax.Array,
    mass: float,
    softening_squared: float,
    interaction_scale: float = 1.0,
    ti: int = DEFAULT_TI,
    tj: int = DEFAULT_TJ,
    sources: jax.Array | None = None,
) -> jax.Array:
    """position [4, Ni] -> [4, Ni] (ax, ay, az, |a|), all float32.

    `sources` ([4, Nj], default = position) selects the j-side bodies; the
    split form is the building block of the multi-chip ring, where each
    stage computes forces from one visiting position block (the ring
    all-gather over ICI, SURVEY §2.3).

    Returns acceleration planes; the Euler tail stays in XLA where it fuses
    with neighbors (its HBM traffic is negligible next to the O(N^2) math).
    """
    if sources is None:
        sources = position
    ni = position.shape[1]
    nj = sources.shape[1]
    ti = _pick(ni, ti)
    tj = _pick(nj, tj)
    num_j_tiles = nj // tj

    posT = position.T  # [Ni, 4], one cheap transpose per step

    kernel = functools.partial(
        _allpairs_kernel,
        num_j_tiles=num_j_tiles,
        tj=tj,
        mass_scale=float(mass) * float(interaction_scale),
        eps2=float(softening_squared),
    )
    accT = pl.pallas_call(
        kernel,
        grid=(ni // ti,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # sources, streamed by DMA
            pl.BlockSpec((ti, 4), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ti, 4), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ni, 4), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((4, 4, tj), jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(ni) * int(nj) * 20,
            bytes_accessed=int(nj) * 16 * (ni // ti + 2),
            transcendentals=int(ni) * int(nj),
        ),
        interpret=interpret_flag(),
    )(sources, posT)
    return accT.T


def make_accel_fn(
    mass: float,
    softening_squared: float,
    interaction_scale: float = 1.0,
    ti: int = DEFAULT_TI,
    tj: int = DEFAULT_TJ,
    half: bool = False,
):
    """Adapter matching the integrator's accel_fn signature
    (position [4, Np] -> accel [3, Np]). `half` opts into the
    Newton-3rd half-pair schedule (`all_pairs_accel_halfpair`)."""

    def accel_fn(position: jax.Array) -> jax.Array:
        if half:
            out = all_pairs_accel_halfpair(
                position,
                mass=mass,
                softening_squared=softening_squared,
                interaction_scale=interaction_scale,
            )
        else:
            out = all_pairs_accel_pallas(
                position,
                mass=mass,
                softening_squared=softening_squared,
                interaction_scale=interaction_scale,
                ti=ti,
                tj=tj,
            )
        return out[:3]

    return accel_fn


# -- Newton-3rd half-pair schedule (opt-in) ---------------------------------------
#
# Each [T, T] pair plane is computed ONCE for tile pairs j >= i and applied
# to BOTH sides (the symmetry `bodyBodyInteraction`'s full rectangle never
# exploited, nBodyGravityCS.hlsl:44-57): the i-side as lane reductions, the
# j-side as negated sublane reductions into a VMEM accumulator that holds
# ONE BAND of `kb` j-tiles (the whole [4, N] hits the 16 MiB scoped-VMEM
# roof past ~250K — the round-3 rejection). One pallas_call per band;
# i-side partials add across bands by linearity.
#
# Measured @1M (v5e fp32, 2026-08-19, experiments/allpairs_halfpair.py v7):
# 0.216 Tpairs/s vs the rectangle kernel's 0.192 = +12.3% (t=512, kb flat
# 64-256); t=256 REGRESSES to 0.171 — half-tiles double per-tile costs.
# Results differ from the rectangle kernel only by accumulation order
# (rel ~2.5e-6 @1M) — opt-in because trajectories are NOT bitwise
# comparable with the default kernel (each variant is individually
# deterministic run-to-run).

_HALF_T = 512   # measured optimum; 256 regresses
_HALF_KB = 128  # j-tiles per VMEM band (4*kb*t floats = 1 MiB at defaults)


def _halfpair_kernel(pos_hbm, posT_i, iacc_out, jacc_out, buf, jacc, iacc,
                     sem, *, j0_tiles, kb, tj, eps2):
    pid = pl.program_id(0)            # i-tile index, 0..(j0_tiles + kb - 1)
    xi = posT_i[:, 0:1]
    yi = posT_i[:, 1:2]
    zi = posT_i[:, 2:3]

    @pl.when(pid == 0)
    def _():
        jacc[...] = jnp.zeros_like(jacc)

    iacc[...] = jnp.zeros_like(iacc)

    def dma(slot, jloc):
        return pltpu.make_async_copy(
            pos_hbm.at[:, pl.ds((j0_tiles + jloc) * tj, tj)],
            buf.at[slot], sem.at[slot])

    jloc0 = jnp.maximum(pid - j0_tiles, 0)
    dma(jax.lax.rem(jloc0, 2), jloc0).start()

    def body(jloc, _):
        # static loop + predicated body: the 0.193 structure from the
        # round-3 sweep (dynamic lower bounds measured 8% slower)
        @pl.when(j0_tiles + jloc >= pid)
        def _():
            slot = jax.lax.rem(jloc, 2)

            @pl.when(jloc + 1 < kb)
            def _():
                dma(1 - slot, jloc + 1).start()

            dma(slot, jloc).wait()
            tile = buf[slot]
            dx = tile[0:1, :] - xi
            dy = tile[1:2, :] - yi
            dz = tile[2:3, :] - zi
            d2 = dx * dx + dy * dy + dz * dz + jnp.float32(eps2)
            inv = jax.lax.rsqrt(d2)
            s = inv * inv * inv
            tx = dx * s
            ty = dy * s
            tz = dz * s
            iacc[:, 0:1] += jnp.sum(tx, axis=1, keepdims=True)
            iacc[:, 1:2] += jnp.sum(ty, axis=1, keepdims=True)
            iacc[:, 2:3] += jnp.sum(tz, axis=1, keepdims=True)

            @pl.when(j0_tiles + jloc > pid)
            def _():
                sl = pl.ds(jloc * tj, tj)
                jacc[0, sl] -= jnp.sum(tx, axis=0)
                jacc[1, sl] -= jnp.sum(ty, axis=0)
                jacc[2, sl] -= jnp.sum(tz, axis=0)

        return 0

    jax.lax.fori_loop(0, kb, body, 0)
    iacc_out[:, :] = iacc[...]

    @pl.when(pid == j0_tiles + kb - 1)
    def _():
        jacc_out[...] = jacc[...]


@functools.partial(
    jax.jit,
    static_argnames=("mass", "softening_squared", "interaction_scale",
                     "t", "kb"),
)
def all_pairs_accel_halfpair(
    position: jax.Array,
    mass: float,
    softening_squared: float,
    interaction_scale: float = 1.0,
    t: int = _HALF_T,
    kb: int = _HALF_KB,
) -> jax.Array:
    """position [4, N] -> [4, N] (ax, ay, az, |a|) via the half-pair
    schedule. Same contract as `all_pairs_accel_pallas` with
    sources == position (the triangle needs the symmetric set; the
    multi-chip ring keeps the rectangle kernel). Falls back to the
    rectangle kernel when N doesn't tile into t-wide bands."""
    n = position.shape[1]
    if n % t or n // t < 2:
        return all_pairs_accel_pallas(
            position, mass=mass, softening_squared=softening_squared,
            interaction_scale=interaction_scale)
    posT = position.T
    nt = n // t
    acc = jnp.zeros((3, n), jnp.float32)
    for j0 in range(0, nt, kb):
        kbb = min(kb, nt - j0)
        ni = j0 + kbb
        nb = kbb * t
        kernel = functools.partial(
            _halfpair_kernel, j0_tiles=j0, kb=kbb, tj=t,
            eps2=float(softening_squared))
        iacc, jacc = pl.pallas_call(
            kernel,
            grid=(ni,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((t, 4), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((t, 4), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((4, nb), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((ni * t, 4), jnp.float32),
                jax.ShapeDtypeStruct((4, nb), jnp.float32),
            ],
            scratch_shapes=[pltpu.VMEM((2, 4, t), jnp.float32),
                            pltpu.VMEM((4, nb), jnp.float32),
                            pltpu.VMEM((t, 4), jnp.float32),
                            pltpu.SemaphoreType.DMA((2,))],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
            cost_estimate=pl.CostEstimate(
                flops=int(ni * t) * nb * 10,
                bytes_accessed=int(ni * t) * 16 + nb * 16,
                transcendentals=int(ni * t) * nb // 2),
            interpret=interpret_flag(),
        )(position, posT)
        acc = acc.at[:, : ni * t].add(iacc.T[:3])
        acc = acc.at[:, j0 * t: j0 * t + nb].add(jacc[:3])
    a3 = acc * jnp.float32(float(mass) * float(interaction_scale))
    amag = jnp.sqrt(jnp.sum(a3 * a3, axis=0, keepdims=True))
    return jnp.concatenate([a3, amag], axis=0)
