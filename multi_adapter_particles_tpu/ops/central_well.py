"""Fused central-well integrator as a Pallas TPU kernel.

The shipped compute shader (`nBodyGravityCS.hlsl:85-109`) is O(N) and
memory-bound: per particle it reads pos/vel, computes the single-well
acceleration and writes pos/vel back. The TPU version fuses force +
semi-implicit Euler + |accel| into one VMEM pass over lane-blocked SoA
planes, so each float is read and written exactly once from HBM — the
speed-of-light for this op is pure HBM bandwidth (14 f32 streams of N).

Layout: position [4, Np] (x, y, z, |accel|), velocity [3, Np], Np a multiple
of 128 (lanes). The grid tiles the lane dimension.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multi_adapter_particles_tpu.ops.dispatch import interpret_flag

# Lane-tile width per grid step: 8 sublane rows aren't used by the (4/3)-row
# planes, so make the lane extent large to amortize; 16384 f32 lanes * 7 rows
# * 2 (in+out) ~= 1.8 MB VMEM per step - comfortably double-bufferable.
DEFAULT_TILE = 16384


def _kernel(pos_ref, vel_ref, out_pos_ref, out_vel_ref, *, dt, damping, mass, eps2):
    x = pos_ref[0:1, :]
    y = pos_ref[1:2, :]
    z = pos_ref[2:3, :]

    d2 = x * x + y * y + z * z + jnp.float32(eps2)
    inv = jax.lax.rsqrt(d2)
    s = jnp.float32(-mass) * (inv * inv * inv)  # -mass / d^3
    ax = x * s
    ay = y * s
    az = z * s

    dtf = jnp.float32(dt)
    dampf = jnp.float32(damping)
    vx = (vel_ref[0:1, :] + ax * dtf) * dampf
    vy = (vel_ref[1:2, :] + ay * dtf) * dampf
    vz = (vel_ref[2:3, :] + az * dtf) * dampf

    out_pos_ref[0:1, :] = x + vx * dtf
    out_pos_ref[1:2, :] = y + vy * dtf
    out_pos_ref[2:3, :] = z + vz * dtf
    out_pos_ref[3:4, :] = jnp.sqrt(ax * ax + ay * ay + az * az)
    out_vel_ref[0:1, :] = vx
    out_vel_ref[1:2, :] = vy
    out_vel_ref[2:3, :] = vz


from multi_adapter_particles_tpu.ops.dispatch import pick_tile


def _pick_tile(n: int, want: int) -> int:
    return pick_tile(n, want, 128)


@functools.partial(
    jax.jit,
    static_argnames=("dt", "damping", "mass", "softening_squared", "tile"),
)
def central_well_step_pallas(
    position: jax.Array,
    velocity: jax.Array,
    dt: float,
    damping: float,
    mass: float,
    softening_squared: float,
    tile: int = DEFAULT_TILE,
) -> Tuple[jax.Array, jax.Array]:
    """One fused integration step. position [4, Np] -> ([4, Np], [3, Np])."""
    n = position.shape[1]
    t = _pick_tile(n, tile)
    grid = (n // t,)

    kernel = functools.partial(
        _kernel, dt=dt, damping=damping, mass=mass, eps2=softening_squared
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((4, t), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, t), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((4, t), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, t), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((4, n), position.dtype),
            jax.ShapeDtypeStruct((3, n), velocity.dtype),
        ],
        interpret=interpret_flag(),
    )(position, velocity)
