"""All-pairs kernel: op attribution + MXU-layout variants (real TPU).

a) attribution: variants of the v0 kernel with pieces removed, to find
   where the cycles go (rsqrt? deltas? accumulation FMAs?).
b) v1b: all-MXU layout — planes are [TJ, TI] (j on sublanes, i on lanes);
   d^2 assembled by one K=4 matmul (w_j = (-2x, -2y, -2z, rj2) against
   v_i = (x, y, z, 1)), force accumulated by one K=TJ matmul
   (tile1 = (xj, yj, zj, 1) @ S). VPU work: 1 add + rsqrt + 2 mul per pair.
   Tested at fp32 (HIGHEST) and bf16 (DEFAULT) matmul precision.

Writes progress unbuffered; run with output to a file, no pipe.
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


# ---------------------------------------------------------------------------
# attribution kernels: v0 with op-groups removed (results are WRONG — perf only)
# ---------------------------------------------------------------------------
def _attr_kernel(pos_hbm, posT_i, accel_out, buf, sem, *,
                 num_j_tiles, tj, mode):
    ti = posT_i.shape[0]
    xi = posT_i[:, 0:1]
    yi = posT_i[:, 1:2]
    zi = posT_i[:, 2:3]

    def dma(slot, j):
        return pltpu.make_async_copy(
            pos_hbm.at[:, pl.ds(j * tj, tj)], buf.at[slot], sem.at[slot])

    dma(0, 0).start()

    def body(j, acc):
        ax, ay, az = acc
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
        d2 = dx * dx + dy * dy + dz * dz + jnp.float32(EPS2)
        if mode == "norsqrt":
            s = d2 * jnp.float32(1e-9)            # mul instead of rsqrt
        else:
            inv = jax.lax.rsqrt(d2)
            s = inv * inv * inv
        if mode == "noaccum":
            ax = ax + jnp.sum(s, axis=1, keepdims=True)  # 1 reduce, no FMA x3
        else:
            ax = ax + jnp.sum(dx * s, axis=1, keepdims=True)
            ay = ay + jnp.sum(dy * s, axis=1, keepdims=True)
            az = az + jnp.sum(dz * s, axis=1, keepdims=True)
        return ax, ay, az

    zero = jnp.zeros((ti, 1), jnp.float32)
    ax, ay, az = jax.lax.fori_loop(0, num_j_tiles, body, (zero, zero, zero))
    accel_out[:, :] = jnp.concatenate(
        [ax, ay, az, jnp.sqrt(ax * ax + ay * ay + az * az)], axis=1)


@functools.partial(jax.jit, static_argnames=("mode", "ti", "tj"))
def attr_accel(position, mode, ti=512, tj=1024):
    n = position.shape[1]
    posT = position.T
    kernel = functools.partial(
        _attr_kernel, num_j_tiles=n // tj, tj=tj, mode=mode)
    return pl.pallas_call(
        kernel,
        grid=(n // ti,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((ti, 4), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ti, 4), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 4), jnp.float32),
        scratch_shapes=[pltpu.VMEM((2, 4, tj), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,))],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret_flag(),
    )(position, posT)


# ---------------------------------------------------------------------------
# v1b: all-MXU layout, planes [TJ, TI]
# ---------------------------------------------------------------------------
def _v1b_kernel(pos_hbm, pos_i, accel_out, buf, sem, *,
                num_j_tiles, tj, precision):
    # pos_i: [4, TI] block (x, y, z, w); output block [4, TI]
    ti = pos_i.shape[1]
    pi3 = pos_i[0:3, :]                                   # [3, TI]
    vi = jnp.concatenate(
        [pi3, jnp.ones((1, ti), jnp.float32)], axis=0)    # [4, TI]
    ri2 = jnp.sum(pi3 * pi3, axis=0, keepdims=True) + jnp.float32(EPS2)

    def dma(slot, j):
        return pltpu.make_async_copy(
            pos_hbm.at[:, pl.ds(j * tj, tj)], buf.at[slot], sem.at[slot])

    dma(0, 0).start()

    def body(j, acc):
        slot = jax.lax.rem(j, 2)

        @pl.when(j + 1 < num_j_tiles)
        def _():
            dma(1 - slot, j + 1).start()

        dma(slot, j).wait()
        tile = buf[slot]                                   # [4, TJ]
        pj3 = tile[0:3, :]
        rj2 = jnp.sum(pj3 * pj3, axis=0, keepdims=True)    # [1, TJ]
        wj = jnp.concatenate([-2.0 * pj3, rj2], axis=0)    # [4, TJ]
        # dotT[j, i] = rj2_j - 2 pi.pj   (K=4 matmul, contract sublane dim)
        dotT = jax.lax.dot_general(
            wj, vi, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )                                                  # [TJ, TI]
        d2 = dotT + ri2                                    # [TJ,TI]+[1,TI]
        inv = jax.lax.rsqrt(d2)
        s = inv * inv * inv
        tile1 = jnp.concatenate(
            [pj3, jnp.ones((1, tile.shape[1]), jnp.float32)], axis=0)
        # F[c, i] += sum_j tile1[c, j] * s[j, i]   (K=TJ matmul)
        return acc + jax.lax.dot_general(
            tile1, s, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )                                                  # [4, TI]

    acc = jax.lax.fori_loop(0, num_j_tiles, body,
                            jnp.zeros((4, ti), jnp.float32))
    m = jnp.float32(MASS)
    a3 = m * (acc[0:3, :] - pi3 * acc[3:4, :])
    amag = jnp.sqrt(jnp.sum(a3 * a3, axis=0, keepdims=True))
    accel_out[:, :] = jnp.concatenate([a3, amag], axis=0)


@functools.partial(jax.jit, static_argnames=("ti", "tj", "precision"))
def v1b_accel(position, ti=512, tj=512, precision="highest"):
    n = position.shape[1]
    prec = (jax.lax.Precision.HIGHEST if precision == "highest"
            else jax.lax.Precision.DEFAULT)
    kernel = functools.partial(
        _v1b_kernel, num_j_tiles=n // tj, tj=tj, precision=prec)
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
        scratch_shapes=[pltpu.VMEM((2, 4, tj), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,))],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=int(n) * int(n) * 24,
            bytes_accessed=int(n) * 16 * (n // ti + 2),
            transcendentals=int(n) * int(n)),
        interpret=interpret_flag(),
    )(position, position)


# ---------------------------------------------------------------------------
# v2: pure XLA expansion
# ---------------------------------------------------------------------------
@functools.partial(jax.jit, static_argnames=("tj",))
def v2_accel(position, tj=2048):
    p = position[:3]
    n = p.shape[1]
    pT = p.T
    r2 = jnp.sum(p * p, axis=0)
    ri2 = (r2 + jnp.float32(EPS2))[:, None]
    pj_t = p.reshape(3, n // tj, tj).transpose(1, 0, 2)
    rj_t = r2.reshape(n // tj, tj)

    def body(acc, tile):
        pj, rj2 = tile
        dot = jax.lax.dot_general(
            pT, pj, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST)
        d2 = ri2 + (rj2[None, :] - 2.0 * dot)
        inv = jax.lax.rsqrt(d2)
        s = inv * inv * inv
        pj1 = jnp.concatenate([pj, jnp.ones((1, tj), jnp.float32)], axis=0)
        return acc + jax.lax.dot_general(
            s, pj1, (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST), None

    acc0 = jnp.zeros((n, 4), jnp.float32)
    acc, _ = jax.lax.scan(body, acc0, (pj_t, rj_t))
    a3 = jnp.float32(MASS) * (acc[:, :3] - pT * acc[:, 3:4])
    amag = jnp.sqrt(jnp.sum(a3 * a3, axis=1, keepdims=True))
    return jnp.concatenate([a3, amag], axis=1).T


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
        print(f"{name}: {dt*1e3:8.2f} ms  {n*n/dt/1e12:7.3f} Tpairs/s",
              flush=True)
        return out
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}", flush=True)
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

    o0 = timeit("v0 baseline      ", v0, pos, n)
    timeit("attr no-rsqrt    ", lambda p: attr_accel(p, "norsqrt"), pos, n)
    timeit("attr no-accum    ", lambda p: attr_accel(p, "noaccum"), pos, n)
    o1h = timeit("v1b mxu fp32     ", lambda p: v1b_accel(p), pos, n)
    o1d = timeit("v1b mxu bf16     ",
                 lambda p: v1b_accel(p, precision="default"), pos, n)
    for tjv in (1024, 2048):
        timeit(f"v1b fp32 tj={tjv:5d}",
               lambda p, t=tjv: v1b_accel(p, tj=t), pos, n)
    o2 = timeit("v2 xla fp32      ", v2_accel, pos, n)

    if o0 is not None:
        a0 = np.asarray(o0)[:3]
        scale = np.abs(a0).max()
        for nm, o in (("v1b fp32", o1h), ("v1b bf16", o1d), ("v2", o2)):
            if o is None:
                continue
            a = np.asarray(o)[:3]
            print(f"{nm} vs v0: max abs {np.abs(a-a0).max():.3e} "
                  f"(rel {np.abs(a-a0).max()/scale:.3e})", flush=True)


if __name__ == "__main__":
    main()
