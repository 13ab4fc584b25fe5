"""All-pairs kernel optimization experiments (run on real TPU).

Variants:
  v0: shipped Pallas kernel (ops/allpairs.py) — VPU elementwise, baseline
  v1: MXU-expansion Pallas kernel — d^2 = ri^2 + rj^2 - 2*Pi@Pj (MXU dot),
      force accumulated as S @ [xj,yj,zj,1] (MXU matmul, fp32 accum)
  v2: pure-XLA expansion (same math, XLA schedules MXU)

Usage: python experiments/allpairs_variants.py [N]
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
# v1: MXU-expansion kernel
# ---------------------------------------------------------------------------
def _v1_kernel(
    posT_hbm,   # [Np, 4] in ANY — j-stream, DMA'd as [TJ, 4] slices
    posT_i,     # [TI, 4] VMEM block
    accel_out,  # [TI, 4]
    buf,        # [2, TJ, 4] scratch
    sem,
    *,
    num_j_tiles: int,
    tj: int,
    mass_scale: float,
    eps2: float,
):
    ti = posT_i.shape[0]
    pi = posT_i[:, 0:3]                      # [TI, 3]
    ri2 = jnp.sum(pi * pi, axis=1, keepdims=True) + jnp.float32(eps2)  # [TI,1]

    def dma(slot, j):
        return pltpu.make_async_copy(
            posT_hbm.at[pl.ds(j * tj, tj), :], buf.at[slot], sem.at[slot]
        )

    dma(0, 0).start()

    def body(j, acc):
        slot = jax.lax.rem(j, 2)

        @pl.when(j + 1 < num_j_tiles)
        def _():
            dma(1 - slot, j + 1).start()

        dma(slot, j).wait()
        tile = buf[slot]                     # [TJ, 4]
        pj = tile[:, 0:3]                    # [TJ, 3]
        rj2 = jnp.sum(pj * pj, axis=1)       # [TJ]

        # d^2 = ri^2 + rj^2 - 2 pi.pj   (the -2dot rides the MXU)
        dot = jax.lax.dot_general(
            pi, pj,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                    # [TI, TJ]
        d2 = ri2 + (rj2[None, :] - 2.0 * dot)
        inv = jax.lax.rsqrt(d2)
        s = inv * inv * inv                  # [TI, TJ]

        # F += S @ [xj yj zj 1]  -> (sum s*xj, ..., sum s)
        pj1 = jnp.concatenate(
            [pj, jnp.ones((tile.shape[0], 1), jnp.float32)], axis=1
        )                                    # [TJ, 4]
        return acc + jax.lax.dot_general(
            s, pj1,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                    # [TI, 4]

    acc = jax.lax.fori_loop(
        0, num_j_tiles, body, jnp.zeros((ti, 4), jnp.float32)
    )
    # accel = m * (F[:, :3] - pi * F[:, 3])
    m = jnp.float32(mass_scale)
    a3 = m * (acc[:, 0:3] - pi * acc[:, 3:4])
    amag = jnp.sqrt(jnp.sum(a3 * a3, axis=1, keepdims=True))
    accel_out[:, :] = jnp.concatenate([a3, amag], axis=1)


@functools.partial(jax.jit, static_argnames=("ti", "tj"))
def v1_accel(position, ti=256, tj=512):
    n = position.shape[1]
    posT = position.T
    kernel = functools.partial(
        _v1_kernel,
        num_j_tiles=n // tj,
        tj=tj,
        mass_scale=float(MASS),
        eps2=float(EPS2),
    )
    accT = pl.pallas_call(
        kernel,
        grid=(n // ti,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((ti, 4), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ti, 4), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 4), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, tj, 4), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(n) * int(n) * 24,
            bytes_accessed=int(n) * 16 * (n // ti + 2),
            transcendentals=int(n) * int(n),
        ),
        interpret=interpret_flag(),
    )(posT, posT)
    return accT.T


# ---------------------------------------------------------------------------
# v2: pure XLA expansion
# ---------------------------------------------------------------------------
@functools.partial(jax.jit, static_argnames=("tj",))
def v2_accel(position, tj=2048):
    p = position[:3]                          # [3, N]
    n = p.shape[1]
    pT = p.T                                  # [N, 3]
    r2 = jnp.sum(p * p, axis=0)               # [N]
    ri2 = (r2 + jnp.float32(EPS2))[:, None]   # [N, 1]

    pj_t = p.reshape(3, n // tj, tj).transpose(1, 0, 2)        # [T, 3, tj]
    rj_t = r2.reshape(n // tj, tj)                             # [T, tj]

    def body(acc, tile):
        pj, rj2 = tile                        # [3, tj], [tj]
        dot = pT @ pj                         # [N, tj] MXU
        d2 = ri2 + (rj2[None, :] - 2.0 * dot)
        inv = jax.lax.rsqrt(d2)
        s = inv * inv * inv                   # [N, tj]
        pj1 = jnp.concatenate(
            [pj, jnp.ones((1, tj), jnp.float32)], axis=0
        )                                     # [4, tj]
        return acc + s @ pj1.T, None          # [N, 4]

    acc0 = jnp.zeros((n, 4), jnp.float32)
    acc, _ = jax.lax.scan(body, acc0, (pj_t, rj_t))
    a3 = jnp.float32(MASS) * (acc[:, :3] - pT * acc[:, 3:4])
    amag = jnp.sqrt(jnp.sum(a3 * a3, axis=1, keepdims=True))
    return jnp.concatenate([a3, amag], axis=1).T


# ---------------------------------------------------------------------------
def timeit(name, fn, pos, n, k=3):
    out = fn(pos)
    _ = float(jax.device_get(out[0, 0]))  # sync (axon: block_until_ready lies)
    t0 = time.perf_counter()
    o = None
    for _ in range(k):
        o = fn(pos)
    _ = float(jax.device_get(o[0, 0]))
    dt = (time.perf_counter() - t0) / k
    print(
        f"{name}: {dt*1e3:8.2f} ms  {n*n/dt/1e12:7.3f} Tpairs/s", flush=True
    )
    return out


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 131072
    key = jax.random.PRNGKey(0)
    pos = jax.random.uniform(key, (4, n), jnp.float32, -400.0, 400.0)
    pos = pos.at[3].set(0.0)

    print(f"N={n}, backend={jax.default_backend()}", flush=True)

    def v0(p):
        return allpairs.all_pairs_accel_pallas(
            p, mass=MASS, softening_squared=EPS2
        )

    o0 = timeit("v0 baseline  ", v0, pos, n)
    o1 = timeit("v1 mxu-pallas", v1_accel, pos, n)
    o2 = timeit("v2 mxu-xla   ", v2_accel, pos, n)

    a0, a1, a2 = (np.asarray(o)[:3] for o in (o0, o1, o2))
    scale = np.abs(a0).max()
    print(f"max|a0|={scale:.3e}")
    print(f"v1 vs v0: max abs diff {np.abs(a1-a0).max():.3e} "
          f"rel {np.abs(a1-a0).max()/scale:.3e}")
    print(f"v2 vs v0: max abs diff {np.abs(a2-a0).max():.3e} "
          f"rel {np.abs(a2-a0).max()/scale:.3e}")


if __name__ == "__main__":
    main()
