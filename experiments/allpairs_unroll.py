"""All-pairs kernel: 2-tile j-unroll with independent accumulator chains.

The v0 loop body serializes on (ax, ay, az): each j-tile's reductions
feed the next iteration's adds. Two tiles per iteration with separate
accumulator sets give the VPU two independent dependency chains to
overlap. Usage: python experiments/allpairs_unroll.py [N]
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


def _kernel(pos_hbm, posT_i, accel_out, buf, sem, *, num_pairs, tj, mass_scale):
    ti = posT_i.shape[0]
    xi = posT_i[:, 0:1]
    yi = posT_i[:, 1:2]
    zi = posT_i[:, 2:3]

    def dma(slot, j):
        return pltpu.make_async_copy(
            pos_hbm.at[:, pl.ds(j * tj, tj)], buf.at[slot], sem.at[slot])

    dma(0, 0).start()
    dma(1, 1).start()

    def tile_force(tile, ax, ay, az):
        xj = tile[0:1, :]
        yj = tile[1:2, :]
        zj = tile[2:3, :]
        dx = xj - xi
        dy = yj - yi
        dz = zj - zi
        d2 = dx * dx + dy * dy + dz * dz + jnp.float32(EPS2)
        inv = jax.lax.rsqrt(d2)
        s = inv * inv * inv
        return (ax + jnp.sum(dx * s, axis=1, keepdims=True),
                ay + jnp.sum(dy * s, axis=1, keepdims=True),
                az + jnp.sum(dz * s, axis=1, keepdims=True))

    def body(p, carry):
        a0x, a0y, a0z, a1x, a1y, a1z = carry
        base = jax.lax.rem(p, 2) * 2

        @pl.when(p + 1 < num_pairs)
        def _():
            nxt = (1 - jax.lax.rem(p, 2)) * 2
            dma(nxt, (p + 1) * 2).start()
            dma(nxt + 1, (p + 1) * 2 + 1).start()

        dma(base, p * 2).wait()
        dma(base + 1, p * 2 + 1).wait()
        # two independent accumulator chains
        a0x, a0y, a0z = tile_force(buf[base], a0x, a0y, a0z)
        a1x, a1y, a1z = tile_force(buf[base + 1], a1x, a1y, a1z)
        return a0x, a0y, a0z, a1x, a1y, a1z

    zero = jnp.zeros((ti, 1), jnp.float32)
    a0x, a0y, a0z, a1x, a1y, a1z = jax.lax.fori_loop(
        0, num_pairs, body, (zero,) * 6)
    m = jnp.float32(mass_scale)
    ax = (a0x + a1x) * m
    ay = (a0y + a1y) * m
    az = (a0z + a1z) * m
    amag = jnp.sqrt(ax * ax + ay * ay + az * az)
    accel_out[:, :] = jnp.concatenate([ax, ay, az, amag], axis=1)


@functools.partial(jax.jit, static_argnames=("ti", "tj"))
def unroll_accel(position, ti=256, tj=2048):
    n = position.shape[1]
    num_j = n // tj
    assert num_j % 2 == 0
    posT = position.T
    kernel = functools.partial(
        _kernel, num_pairs=num_j // 2, tj=tj, mass_scale=float(MASS))
    accT = pl.pallas_call(
        kernel,
        grid=(n // ti,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((ti, 4), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ti, 4), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 4), jnp.float32),
        scratch_shapes=[pltpu.VMEM((4, 4, tj), jnp.float32),
                        pltpu.SemaphoreType.DMA((4,))],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=int(n) * int(n) * 20,
            bytes_accessed=int(n) * 16 * (n // ti + 2),
            transcendentals=int(n) * int(n)),
        interpret=interpret_flag(),
    )(position, posT)
    return accT.T


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 131072
    pos = jax.random.uniform(
        jax.random.PRNGKey(0), (4, n), jnp.float32, -400.0, 400.0
    ).at[3].set(0.0)
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
            print(f"{name:24s}: {dt*1e3:8.2f} ms  {n*n/dt/1e12:6.3f} Tpairs/s",
                  flush=True)
            return o
        except Exception as e:
            print(f"{name}: FAIL {str(e)[:200]}", flush=True)
            return None

    ref = timeit("v0", lambda p: allpairs.all_pairs_accel_pallas(
        p, mass=MASS, softening_squared=EPS2))
    for ti, tj in ((256, 2048), (256, 1024), (512, 1024)):
        o = timeit(f"unroll2 ti={ti} tj={tj}",
                   lambda p, a=ti, b=tj: unroll_accel(p, ti=a, tj=b))
    if ref is not None and o is not None:
        a, b = np.asarray(ref)[:3], np.asarray(o)[:3]
        print(f"max rel diff: {np.abs(a-b).max()/np.abs(a).max():.2e}",
              flush=True)


if __name__ == "__main__":
    main()
