"""Conservation diagnostics — energy / momentum / angular momentum gauges.

The reference's only physics observability is the accel-magnitude color
channel it writes into pos.w (`nBodyGravityCS.hlsl:107`) and the stage
timers; it has no way to tell whether a long run is physically drifting.
A production n-body framework needs conservation tracking, so this module
adds it (beyond reference, like checkpointing): jitted device reductions
producing a handful of scalars, published as metrics gauges at a low
cadence (`-diagnostics K`).

Physics notes (why these numbers mean what they claim):

- The semi-implicit Euler step (`integrator.euler_update`, the shipped
  CSMain math `nBodyGravityCS.hlsl:103-105`) IS the leapfrog/kick-drift
  integrator with velocities stored at the half step (v_{n+1/2}); with
  damping=1 it is symplectic, so the energy error of the exact-force
  models is bounded and oscillatory, not secular. Reporting energy with
  the RAW stored velocity carries an O(dt) sawtooth from the half-step
  offset that buries real drift; `sync=True` (default) removes it by
  half-kicking the velocity to the position's time:
  v_sync = v + a(p) * dt/2.
- Potential energy for the self-gravity models uses the exact softened
  (Plummer) pairwise sum — the potential whose gradient is exactly the
  `bodyBodyInteraction` force law — REGARDLESS of which approximation
  (all-pairs / pm_grid / p3m / tree) produced the forces. The energy
  gauge therefore doubles as an approximation-quality probe: a PM run
  whose force error is secularly pumping energy shows up here. The sum
  is O(N²) (one j-tile scan, same blocked structure as
  `integrator.all_pairs_accel`, and the exact accel for the half-kick
  falls out of the same pass for free); run it at a cadence, not per
  frame.
- central_well: U_i = -M / sqrt(|r_i|² + eps²) per unit particle mass
  (the softened point-mass well; its gradient is the CSMain force).
- Particles are equal unit masses (the reference carries no per-particle
  mass), so momentum and angular momentum are plain masked sums; the
  all-pairs force law is antisymmetric, so both are conserved by the
  exact dynamics and their drift measures reduction/approximation noise.
- damping != 1 intentionally dissipates: the energy gauge then tracks
  the designed decay and `sync` still removes the sawtooth.

Padding particles (parked at 1e9 with zero velocity) are masked out of
every sum — two co-located parked particles would otherwise contribute
1/eps pair terms.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp

from multi_adapter_particles_tpu.config import SimConfig
from multi_adapter_particles_tpu.models.integrator import central_well_accel
from multi_adapter_particles_tpu.models.state import ParticleState

Array = jax.Array

_SELF_GRAVITY = ("all_pairs", "pm_grid", "p3m")


def pairwise_potential_and_accel(
    position: Array,
    mask: Array,
    g_scale: float,
    softening_squared: float,
    j_tile: int = 1024,
) -> tuple[Array, Array]:
    """Exact softened pairwise (potential, accel) in one blocked pass.

    potential = -0.5 * g * sum_{i != j} m_i m_j / sqrt(d_ij² + eps²)
    accel_i   =        g * sum_j (p_j - p_i) m_j / (d_ij² + eps²)^{3/2}

    `g_scale` = mass * interaction_scale (the per-pair coupling the force
    models use). The i == j term contributes exactly zero force (r_ii = 0)
    and a known 1/eps self-energy, which is subtracted analytically.
    """
    p = position[:3]
    n = p.shape[1]
    if n % j_tile != 0:
        j_tile = n
    num_tiles = n // j_tile
    eps2 = jnp.float32(softening_squared)
    g = jnp.float32(g_scale)

    p_tiles = jnp.moveaxis(p.reshape(3, num_tiles, j_tile), 1, 0)
    m_tiles = mask.reshape(num_tiles, j_tile)

    def body(carry, tile):
        inv_sum, acc = carry
        pj, mj = tile
        dx = pj[0][None, :] - p[0][:, None]
        dy = pj[1][None, :] - p[1][:, None]
        dz = pj[2][None, :] - p[2][:, None]
        d2 = dx * dx + dy * dy + dz * dz + eps2
        inv = jax.lax.rsqrt(d2) * mj[None, :]
        s = inv / d2  # = m_j / (d² + eps²)^{3/2}
        ax = jnp.sum(dx * s, axis=1)
        ay = jnp.sum(dy * s, axis=1)
        az = jnp.sum(dz * s, axis=1)
        return (inv_sum + jnp.sum(inv, axis=1),
                acc + jnp.stack([ax, ay, az])), None

    zero_rows = p * jnp.zeros((), dtype=p.dtype)
    (inv_sum, acc), _ = jax.lax.scan(
        body, (zero_rows[0], zero_rows), (p_tiles, m_tiles)
    )
    # remove the i == j self term 1/eps from each row's 1/r sum
    self_inv = mask * jax.lax.rsqrt(eps2)
    potential = -0.5 * g * jnp.sum(mask * (inv_sum - self_inv))
    return potential, acc * g


def make_diagnostics(
    config: SimConfig,
    sync: bool = True,
    j_tile: int = 1024,
) -> Callable[[ParticleState], Dict[str, Array]]:
    """Build the jitted `state -> {scalar gauges}` diagnostics function.

    Returned keys: kinetic, potential, energy (their sum), momentum_x/y/z,
    momentum_mag, angular_momentum_mag — all f32 0-d arrays on device
    (pull with float() at the publish site; that is the one host sync).
    """
    n = config.num_particles
    dt = jnp.float32(config.dt)
    model = config.force_model

    if model in _SELF_GRAVITY:
        # resolved in SimConfig.__post_init__ (auto: 1/N for self-gravity)
        g_scale = config.mass * config.interaction_scale
    else:
        g_scale = None  # central well

    def diagnostics(state: ParticleState) -> Dict[str, Array]:
        mask = state.make_mask(n)
        pos = state.position
        vel = state.velocity

        if model in _SELF_GRAVITY:
            potential, accel = pairwise_potential_and_accel(
                pos, mask, g_scale, config.softening_squared, j_tile
            )
        else:
            r = pos[:3]
            d2 = jnp.sum(r * r, axis=0) + jnp.float32(
                config.softening_squared
            )
            potential = jnp.sum(
                mask * (-jnp.float32(config.mass)) * jax.lax.rsqrt(d2)
            )
            accel = central_well_accel(
                pos, config.mass, config.softening_squared
            )

        v = vel + 0.5 * dt * accel if sync else vel
        vm = v * mask[None, :]
        kinetic = 0.5 * jnp.sum(vm * vm)
        momentum = jnp.sum(vm, axis=1)
        ang = jnp.sum(
            jnp.cross(pos[:3] * mask[None, :], vm, axis=0), axis=1
        )
        return {
            "kinetic": kinetic,
            "potential": potential,
            "energy": kinetic + potential,
            "momentum_x": momentum[0],
            "momentum_y": momentum[1],
            "momentum_z": momentum[2],
            "momentum_mag": jnp.sqrt(jnp.sum(momentum * momentum)),
            "angular_momentum_mag": jnp.sqrt(jnp.sum(ang * ang)),
        }

    return jax.jit(diagnostics)


class DiagnosticsProbe:
    """Cadenced publisher: computes the gauges every `every` frames and
    writes them into a MetricsRegistry, tracking relative energy drift
    against the first sample (`energy_drift`)."""

    def __init__(self, config: SimConfig, every: int, sync: bool = True):
        self.every = max(1, int(every))
        self._fn = make_diagnostics(config, sync=sync)
        self._e0: Optional[float] = None

    def maybe_publish(self, frame_count: int, state, metrics) -> bool:
        if frame_count % self.every:
            return False
        vals = {k: float(v) for k, v in self._fn(state).items()}
        if self._e0 is None:
            self._e0 = vals["energy"]
        denom = abs(self._e0) or 1.0
        vals["energy_drift"] = (vals["energy"] - self._e0) / denom
        for k, v in vals.items():
            metrics.gauge(k, v)
        return True
