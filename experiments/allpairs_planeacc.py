"""All-pairs v4: plane accumulation — FMA forces into [TI, TJ] planes.

v0 reduces each j-tile's forces immediately (3 muls + 3 reduction adds
per pair). Holding THREE [TI, TJ] accumulator planes instead turns the
force application into 3 FMAs per pair (acc_x += dx*s), with the lane
reduction paid ONCE after the j-loop (amortized ~3/num_tiles per pair).
Per-pair VPU ops drop ~15 -> ~12.

v4h additionally tries the half-pair idea WITHIN the plane scheme by
also FMA-ing the j-side (acc planes in the j orientation) — see comments.

Usage: python experiments/allpairs_planeacc.py [N]
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


def _v4_kernel(pos_hbm, posT_i, accel_out, buf, accx, accy, accz, sem, *,
               num_j_tiles, tj, mass_scale, eps2):
    ti = posT_i.shape[0]
    xi = posT_i[:, 0:1]
    yi = posT_i[:, 1:2]
    zi = posT_i[:, 2:3]

    def dma(slot, j):
        return pltpu.make_async_copy(
            pos_hbm.at[:, pl.ds(j * tj, tj)], buf.at[slot], sem.at[slot])

    dma(0, 0).start()
    accx[...] = jnp.zeros_like(accx)
    accy[...] = jnp.zeros_like(accy)
    accz[...] = jnp.zeros_like(accz)

    def body(j, _):
        slot = jax.lax.rem(j, 2)

        @pl.when(j + 1 < num_j_tiles)
        def _():
            dma(1 - slot, j + 1).start()

        dma(slot, j).wait()
        tile = buf[slot]
        xj = tile[0:1, :]
        yj = tile[1:2, :]
        zj = tile[2:3, :]
        dx = xj - xi
        dy = yj - yi
        dz = zj - zi
        d2 = dx * dx + dy * dy + dz * dz + jnp.float32(eps2)
        inv = jax.lax.rsqrt(d2)
        s = inv * inv * inv
        accx[...] += dx * s
        accy[...] += dy * s
        accz[...] += dz * s
        return 0

    jax.lax.fori_loop(0, num_j_tiles, body, 0)
    m = jnp.float32(mass_scale)
    ax = jnp.sum(accx[...], axis=1, keepdims=True) * m
    ay = jnp.sum(accy[...], axis=1, keepdims=True) * m
    az = jnp.sum(accz[...], axis=1, keepdims=True) * m
    amag = jnp.sqrt(ax * ax + ay * ay + az * az)
    accel_out[:, :] = jnp.concatenate([ax, ay, az, amag], axis=1)


@functools.partial(jax.jit, static_argnames=("ti", "tj"))
def v4_accel(position, ti=256, tj=1024):
    n = position.shape[1]
    posT = position.T
    kernel = functools.partial(
        _v4_kernel, num_j_tiles=n // tj, tj=tj,
        mass_scale=MASS, eps2=EPS2)
    return pl.pallas_call(
        kernel,
        grid=(n // ti,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((ti, 4), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ti, 4), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 4), jnp.float32),
        scratch_shapes=[pltpu.VMEM((2, 4, tj), jnp.float32),
                        pltpu.VMEM((ti, tj), jnp.float32),
                        pltpu.VMEM((ti, tj), jnp.float32),
                        pltpu.VMEM((ti, tj), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,))],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=int(n) * int(n) * 20,
            bytes_accessed=int(n) * 16 * (n // ti + 2),
            transcendentals=int(n) * int(n)),
        interpret=interpret_flag(),
    )(position, posT)


def timeit(name, fn, pos, n, k=3):
    try:
        out = fn(pos)
        _ = float(jax.device_get(out[0, 0]))
        t0 = time.perf_counter()
        o = None
        for _ in range(k):
            o = fn(pos)
        _ = float(jax.device_get(o[0, 0]))
        dt = (time.perf_counter() - t0) / k
        print(f"{name:24s}: {dt*1e3:8.2f} ms  {n*n/dt/1e12:7.3f} Tpairs/s",
              flush=True)
        return out
    except Exception as e:
        print(f"{name:24s}: FAILED {type(e).__name__}: {str(e)[:300]}",
              flush=True)
        return None


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 131072
    key = jax.random.PRNGKey(0)
    pos = jax.random.uniform(key, (4, n), jnp.float32, -400.0, 400.0)
    pos = pos.at[3].set(0.0)
    print(f"N={n}, backend={jax.default_backend()}", flush=True)

    def v0(p):
        return allpairs.all_pairs_accel_pallas(
            p, mass=MASS, softening_squared=EPS2)

    o0 = timeit("v0 baseline", v0, pos, n)
    outs = {}
    for ti, tj in ((256, 1024), (256, 2048), (128, 2048), (512, 1024),
                   (256, 512), (512, 512)):
        o = timeit(f"v4 plane ti={ti} tj={tj}",
                   lambda p, a=ti, b=tj: v4_accel(p, ti=a, tj=b), pos, n)
        if o is not None:
            outs[f"ti={ti},tj={tj}"] = o

    if o0 is not None:
        a0 = np.asarray(o0)[:3]
        scale = np.abs(a0).max()
        for nm, o in outs.items():
            a = np.asarray(o)[:3]
            d = np.abs(a - a0)
            print(f"v4 {nm} vs v0: max abs {d.max():.3e} "
                  f"(rel {d.max()/scale:.3e})", flush=True)


if __name__ == "__main__":
    main()
