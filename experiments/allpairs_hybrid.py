"""Hybrid all-pairs kernel: VPU elementwise + MXU expansion concurrently.

RESULT (v5e, 2026-08-16): 0.117 Tpairs/s vs 0.156 for the plain VPU kernel
at N=98304 — Mosaic does NOT interleave the MXU matmuls with the VPU tile
work in this structure (and the VPU path pays 3 lane->sublane relayouts
per tile in the [*, TI] orientation). Negative result kept for the record;
the VPU kernel (ops/allpairs.py) remains the production path.

Measured separately: the VPU kernel hits ~0.167 Tpairs/s, the fp32-MXU
expansion ~0.087. They run on different execution units, so one loop body
that blends 2 tiles on the VPU and 1 tile on the MXU would overlap both if
the scheduler cooperated: predicted ~0.25 Tpairs/s (+50%).

Layout notes: the MXU path wants [*, TI] planes (i on lanes); the VPU path
wants [TJ, TI] pairwise planes (j on sublanes), which costs three [1,TJ] ->
[TJ,1] relayouts per VPU tile (~1% of plane ops at TJ=512).

Usage: python experiments/allpairs_hybrid.py [N]
"""

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multi_adapter_particles_tpu import constants as C
from multi_adapter_particles_tpu.ops import allpairs
from multi_adapter_particles_tpu.ops.dispatch import interpret_flag

MASS = C.PARTICLE_MASS
EPS2 = C.SOFTENING_SQUARED
GROUP = 3  # tiles per iteration: 2 VPU + 1 MXU


def _hybrid_kernel(pos_hbm, pos_i, accel_out, buf, sem, *, num_groups, tj):
    ti = pos_i.shape[1]
    pi3 = pos_i[0:3, :]                                    # [3, TI]
    vi = jnp.concatenate([pi3, jnp.ones((1, ti), jnp.float32)], axis=0)
    ri2 = jnp.sum(pi3 * pi3, axis=0, keepdims=True) + jnp.float32(EPS2)

    nslots = 2 * GROUP

    def dma(slot, j):
        return pltpu.make_async_copy(
            pos_hbm.at[:, pl.ds(j * tj, tj)], buf.at[slot], sem.at[slot])

    for t in range(GROUP):
        dma(t, t).start()

    def vpu_tile(tile, acc):
        ax, ay, az = acc
        pj3 = tile[0:3, :]                                  # [3, TJ]
        # pairwise planes [TJ, TI]: j sublanes, i lanes
        xj = pj3[0:1, :].reshape(tj, 1)
        yj = pj3[1:2, :].reshape(tj, 1)
        zj = pj3[2:3, :].reshape(tj, 1)
        dx = xj - pos_i[0:1, :]
        dy = yj - pos_i[1:2, :]
        dz = zj - pos_i[2:3, :]
        d2 = dx * dx + dy * dy + dz * dz + jnp.float32(EPS2)
        inv = jax.lax.rsqrt(d2)
        s = inv * inv * inv
        ax = ax + jnp.sum(dx * s, axis=0, keepdims=True)
        ay = ay + jnp.sum(dy * s, axis=0, keepdims=True)
        az = az + jnp.sum(dz * s, axis=0, keepdims=True)
        return ax, ay, az

    def mxu_tile(tile, accm):
        pj3 = tile[0:3, :]
        rj2 = jnp.sum(pj3 * pj3, axis=0, keepdims=True)
        wj = jnp.concatenate([-2.0 * pj3, rj2], axis=0)     # [4, TJ]
        dotT = jax.lax.dot_general(
            wj, vi, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )                                                   # [TJ, TI]
        d2 = dotT + ri2
        inv = jax.lax.rsqrt(d2)
        s = inv * inv * inv
        tile1 = jnp.concatenate(
            [pj3, jnp.ones((1, tile.shape[1]), jnp.float32)], axis=0)
        return accm + jax.lax.dot_general(
            tile1, s, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )                                                   # [4, TI]

    def body(g, carry):
        ax, ay, az, accm = carry
        base = jax.lax.rem(g, 2) * GROUP                    # slot ring half

        @pl.when(g + 1 < num_groups)
        def _():
            nxt = (1 - jax.lax.rem(g, 2)) * GROUP
            for t in range(GROUP):
                dma(nxt + t, (g + 1) * GROUP + t).start()

        tiles = []
        for t in range(GROUP):
            pltpu.make_async_copy(
                pos_hbm.at[:, pl.ds((g * GROUP + t) * tj, tj)],
                buf.at[base + t],
                sem.at[base + t],
            ).wait()
            tiles.append(buf[base + t])
        # one body: 2 VPU tiles + 1 MXU tile -> schedulable on both units
        ax, ay, az = vpu_tile(tiles[0], (ax, ay, az))
        accm = mxu_tile(tiles[2], accm)
        ax, ay, az = vpu_tile(tiles[1], (ax, ay, az))
        return ax, ay, az, accm

    zero1 = jnp.zeros((1, ti), jnp.float32)
    ax, ay, az, accm = jax.lax.fori_loop(
        0, num_groups, body,
        (zero1, zero1, zero1, jnp.zeros((4, ti), jnp.float32)))
    m = jnp.float32(MASS)
    a3 = m * (jnp.concatenate([ax, ay, az], axis=0)
              + accm[0:3, :] - pi3 * accm[3:4, :])
    amag = jnp.sqrt(jnp.sum(a3 * a3, axis=0, keepdims=True))
    accel_out[:, :] = jnp.concatenate([a3, amag], axis=0)


@functools.partial(jax.jit, static_argnames=("ti", "tj"))
def hybrid_accel(position, ti=256, tj=512):
    n = position.shape[1]
    num_j = n // tj
    if num_j % GROUP:
        raise ValueError("num_j must divide by the tile group")
    kernel = functools.partial(
        _hybrid_kernel, num_groups=num_j // GROUP, tj=tj)
    return pl.pallas_call(
        kernel,
        grid=(n // ti,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((4, ti), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((4, ti), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((2 * GROUP, 4, tj), jnp.float32),
                        pltpu.SemaphoreType.DMA((2 * GROUP,))],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=int(n) * int(n) * 24,
            bytes_accessed=int(n) * 16 * (n // ti + 2),
            transcendentals=int(n) * int(n)),
        interpret=interpret_flag(),
    )(position, position)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 98304  # 192 j-tiles @512
    key = jax.random.PRNGKey(0)
    pos = jax.random.uniform(key, (4, n), jnp.float32, -400.0, 400.0)
    pos = pos.at[3].set(0.0)
    print(f"N={n} backend={jax.default_backend()}", flush=True)

    def timeit(name, fn, k=3):
        try:
            o = fn(pos)
            _ = float(jax.device_get(o[0, 0]))
            t0 = time.perf_counter()
            for _ in range(k):
                o = fn(pos)
            _ = float(jax.device_get(o[0, 0]))
            dt = (time.perf_counter() - t0) / k
            print(f"{name:28s}: {dt*1e3:8.2f} ms  {n*n/dt/1e12:6.3f} Tpairs/s",
                  flush=True)
            return o
        except Exception as e:
            print(f"{name}: FAIL {str(e)[:200]}", flush=True)
            return None

    ref = timeit("v0 (current default)", lambda p: allpairs.all_pairs_accel_pallas(
        p, mass=MASS, softening_squared=EPS2))
    hyb = timeit("hybrid 2:1", hybrid_accel)
    if ref is not None and hyb is not None:
        a, b = np.asarray(ref)[:3], np.asarray(hyb)[:3]
        print(f"hybrid vs v0 max rel: {np.abs(a-b).max()/np.abs(a).max():.2e}",
              flush=True)


if __name__ == "__main__":
    main()
