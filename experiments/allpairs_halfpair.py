"""All-pairs v5: Newton-3rd-law half-pair schedule (triangular tiles).

Each [TI, TJ] pair plane is computed ONCE for tile pairs j > i and applied
to BOTH sides:
  - i-side: lane reduction of t = d*s  ->  [TI, 1] register carries (as v0)
  - j-side: sublane reduction of the SAME t planes -> [TJ] vectors,
    accumulated into a persistent [4, N] VMEM accumulator (read-modify-
    write once per tile — amortized ~12/TI ops per pair)
The diagonal tile is applied i-side only (it already contains both (a,b)
and (b,a)). Shared per unique pair: deltas (3), d2 (3), rsqrt (1), s (2),
products (3); the two reductions add 3+3 -> ~18 ops per unique pair
vs v0's ~15 per DIRECTED pair => ideal ~1.67x.

The kernel grid walks i-tiles; the j-stream runs j = i..T-1 (triangular,
dynamic lower bound). The j-side accumulator lives in VMEM scratch across
grid steps (single band; banding extends this to N where [4, N] exceeds
VMEM — 4 MiB at 256K).

This is the `bodyBodyInteraction` tiling (nBodyGravityCS.hlsl:44-57) plus
the symmetry the HLSL original never exploited.

Usage: python experiments/allpairs_halfpair.py [N]
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


def _v5_kernel(pos_hbm, posT_i, iacc_out, jacc_out, buf, jacc, sem, *,
               num_tiles, tj, eps2, mode="full"):
    ti = posT_i.shape[0]
    pid = pl.program_id(0)
    xi = posT_i[:, 0:1]
    yi = posT_i[:, 1:2]
    zi = posT_i[:, 2:3]

    @pl.when(pid == 0)
    def _():
        jacc[...] = jnp.zeros_like(jacc)

    def dma(slot, j):
        return pltpu.make_async_copy(
            pos_hbm.at[:, pl.ds(j * tj, tj)], buf.at[slot], sem.at[slot])

    # j ranges over [pid*ratio ... num_tiles): the i-tile index in units of
    # j-tiles. TI == TJ here for a clean triangle.
    j0 = pid
    dma(0, j0).start()

    def body(j, carry):
        ax, ay, az = carry
        slot = jax.lax.rem(j - j0, 2)

        @pl.when(j + 1 < num_tiles)
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
        tx = dx * s
        ty = dy * s
        tz = dz * s
        ax = ax + jnp.sum(tx, axis=1, keepdims=True)
        ay = ay + jnp.sum(ty, axis=1, keepdims=True)
        az = az + jnp.sum(tz, axis=1, keepdims=True)

        if mode == "full":
            @pl.when(j > pid)
            def _():
                # j-side: force on tile j from block i is -sum_i t
                sl = pl.ds(j * tj, tj)
                jacc[0, sl] -= jnp.sum(tx, axis=0)
                jacc[1, sl] -= jnp.sum(ty, axis=0)
                jacc[2, sl] -= jnp.sum(tz, axis=0)
        elif mode == "reduce_only":
            # sublane reduces kept live via a cheap register carry
            jacc[0, pl.ds(0, tj)] -= (
                jnp.sum(tx, axis=0) + jnp.sum(ty, axis=0)
                + jnp.sum(tz, axis=0))

        return ax, ay, az

    zero = jnp.zeros((ti, 1), jnp.float32)
    ax, ay, az = jax.lax.fori_loop(
        j0, num_tiles, body, (zero, zero, zero)
    )
    iacc_out[:, :] = jnp.concatenate(
        [ax, ay, az, jnp.zeros((ti, 1), jnp.float32)], axis=1)

    @pl.when(pid == num_tiles - 1)
    def _():
        jacc_out[...] = jacc[...]


def _v5s_kernel(pos_hbm, posT_i, iacc_out, jacc_out, buf, jacc, iacc, sem, *,
                num_tiles, tj, eps2):
    """Static-bound variant: fori over ALL tiles with the body predicated
    on j >= pid (pl.when); i-side accumulators live in a small VMEM
    scratch so the loop carries nothing."""
    ti = posT_i.shape[0]
    pid = pl.program_id(0)
    xi = posT_i[:, 0:1]
    yi = posT_i[:, 1:2]
    zi = posT_i[:, 2:3]

    @pl.when(pid == 0)
    def _():
        jacc[...] = jnp.zeros_like(jacc)

    iacc[...] = jnp.zeros_like(iacc)

    def dma(slot, j):
        return pltpu.make_async_copy(
            pos_hbm.at[:, pl.ds(j * tj, tj)], buf.at[slot], sem.at[slot])

    dma(jax.lax.rem(pid, 2), pid).start()

    def body(j, _):
        @pl.when(j >= pid)
        def _():
            slot = jax.lax.rem(j, 2)

            @pl.when(j + 1 < num_tiles)
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
            tx = dx * s
            ty = dy * s
            tz = dz * s
            iacc[:, 0:1] += jnp.sum(tx, axis=1, keepdims=True)
            iacc[:, 1:2] += jnp.sum(ty, axis=1, keepdims=True)
            iacc[:, 2:3] += jnp.sum(tz, axis=1, keepdims=True)

            @pl.when(j > pid)
            def _():
                sl = pl.ds(j * tj, tj)
                jacc[0, sl] -= jnp.sum(tx, axis=0)
                jacc[1, sl] -= jnp.sum(ty, axis=0)
                jacc[2, sl] -= jnp.sum(tz, axis=0)

        return 0

    jax.lax.fori_loop(0, num_tiles, body, 0)
    iacc_out[:, :] = iacc[...]

    @pl.when(pid == num_tiles - 1)
    def _():
        jacc_out[...] = jacc[...]


@functools.partial(jax.jit, static_argnames=("t",))
def v5s_accel(position, t=512):
    n = position.shape[1]
    posT = position.T
    num_tiles = n // t
    kernel = functools.partial(_v5s_kernel, num_tiles=num_tiles, tj=t,
                               eps2=EPS2)
    iacc, jacc = pl.pallas_call(
        kernel,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((t, 4), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((t, 4), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, 4), jnp.float32),
            jax.ShapeDtypeStruct((4, n), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((2, 4, t), jnp.float32),
                        pltpu.VMEM((4, n), jnp.float32),
                        pltpu.VMEM((t, 4), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,))],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=int(n) * int(n) * 10,
            bytes_accessed=int(n) * 16 * (n // t // 2 + 2),
            transcendentals=int(n) * int(n) // 2),
        interpret=interpret_flag(),
    )(position, posT)
    m = jnp.float32(MASS)
    a3 = (iacc.T[:3] + jacc[:3]) * m
    amag = jnp.sqrt(jnp.sum(a3 * a3, axis=0, keepdims=True))
    return jnp.concatenate([a3, amag], axis=0)


@functools.partial(jax.jit, static_argnames=("t", "mode"))
def v5_accel(position, t=512, mode="full"):
    n = position.shape[1]
    posT = position.T
    num_tiles = n // t
    kernel = functools.partial(_v5_kernel, num_tiles=num_tiles, tj=t,
                               eps2=EPS2, mode=mode)
    iacc, jacc = pl.pallas_call(
        kernel,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((t, 4), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((t, 4), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, 4), jnp.float32),
            jax.ShapeDtypeStruct((4, n), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((2, 4, t), jnp.float32),
                        pltpu.VMEM((4, n), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,))],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=int(n) * int(n) * 10,
            bytes_accessed=int(n) * 16 * (n // t // 2 + 2),
            transcendentals=int(n) * int(n) // 2),
        interpret=interpret_flag(),
    )(position, posT)
    m = jnp.float32(MASS)
    a3 = (iacc.T[:3] + jacc[:3]) * m
    amag = jnp.sqrt(jnp.sum(a3 * a3, axis=0, keepdims=True))
    return jnp.concatenate([a3, amag], axis=0)




def _v6_kernel(iofk, jofk, posT_i, pos_j, iacc_out, jacc_out, jacc, *,
               num_steps, tj, eps2):
    """Prefetch-grid triangle: one (i-block, j-tile) pair per grid step,
    i-major order. Pallas's own pipeline streams the blocks; the i-side
    accumulates into the (consecutively revisited) output block; the
    j-side RMWs a persistent [4, N] VMEM accumulator."""
    k = pl.program_id(0)
    i = iofk[k]
    j = jofk[k]
    ti = posT_i.shape[0]

    @pl.when(k == 0)
    def _():
        jacc[...] = jnp.zeros_like(jacc)

    xi = posT_i[:, 0:1]
    yi = posT_i[:, 1:2]
    zi = posT_i[:, 2:3]
    xj = pos_j[0:1, :]
    yj = pos_j[1:2, :]
    zj = pos_j[2:3, :]
    dx = xj - xi
    dy = yj - yi
    dz = zj - zi
    d2 = dx * dx + dy * dy + dz * dz + jnp.float32(eps2)
    inv = jax.lax.rsqrt(d2)
    s = inv * inv * inv
    tx = dx * s
    ty = dy * s
    tz = dz * s
    isum = jnp.concatenate([
        jnp.sum(tx, axis=1, keepdims=True),
        jnp.sum(ty, axis=1, keepdims=True),
        jnp.sum(tz, axis=1, keepdims=True),
        jnp.zeros((ti, 1), jnp.float32),
    ], axis=1)

    @pl.when(j == i)
    def _():
        iacc_out[...] = isum

    @pl.when(j > i)
    def _():
        iacc_out[...] += isum
        sl = pl.ds(j * tj, tj)
        jacc[0, sl] -= jnp.sum(tx, axis=0)
        jacc[1, sl] -= jnp.sum(ty, axis=0)
        jacc[2, sl] -= jnp.sum(tz, axis=0)

    @pl.when(k == num_steps - 1)
    def _():
        jacc_out[...] = jacc[...]


@functools.partial(jax.jit, static_argnames=("t",))
def v6_accel(position, t=512):
    n = position.shape[1]
    posT = position.T
    nt = n // t
    pairs = [(i, j) for i in range(nt) for j in range(i, nt)]
    iofk = jnp.asarray([p[0] for p in pairs], jnp.int32)
    jofk = jnp.asarray([p[1] for p in pairs], jnp.int32)
    K = len(pairs)
    kernel = functools.partial(_v6_kernel, num_steps=K, tj=t, eps2=EPS2)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(K,),
        in_specs=[
            pl.BlockSpec((t, 4), lambda k, io, jo: (io[k], 0)),
            pl.BlockSpec((4, t), lambda k, io, jo: (0, jo[k])),
        ],
        out_specs=[
            pl.BlockSpec((t, 4), lambda k, io, jo: (io[k], 0)),
            pl.BlockSpec((4, n), lambda k, io, jo: (0, 0)),
        ],
        scratch_shapes=[pltpu.VMEM((4, n), jnp.float32)],
    )
    iacc, jacc = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n, 4), jnp.float32),
            jax.ShapeDtypeStruct((4, n), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=int(n) * int(n) * 10,
            bytes_accessed=int(n) * 16 * (n // t // 2 + 2),
            transcendentals=int(n) * int(n) // 2),
        interpret=interpret_flag(),
    )(iofk, jofk, posT, position)
    m = jnp.float32(MASS)
    a3 = (iacc.T[:3] + jacc[:3]) * m
    amag = jnp.sqrt(jnp.sum(a3 * a3, axis=0, keepdims=True))
    return jnp.concatenate([a3, amag], axis=0)


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
    for t in (256, 512):
        o = timeit(f"v5 halfpair t={t}",
                   lambda p, tt=t: v5_accel(p, t=tt), pos, n)
        if o is not None:
            outs[f"t={t}"] = o
    for mode in ("reduce_only", "tri_only"):
        for t in (512,):
            timeit(f"v5 {mode} t={t} (attr)",
                   lambda p, tt=t, m=mode: v5_accel(p, t=tt, mode=m), pos, n)
    for t in (256, 512):
        o = timeit(f"v5s static t={t}",
                   lambda p, tt=t: v5s_accel(p, t=tt), pos, n)
        if o is not None:
            outs[f"static t={t}"] = o
    for t in (256, 512, 1024):
        o = timeit(f"v6 prefetch t={t}",
                   lambda p, tt=t: v6_accel(p, t=tt), pos, n)
        if o is not None:
            outs[f"v6 t={t}"] = o

    if o0 is not None:
        a0 = np.asarray(o0)[:3]
        scale = np.abs(a0).max()
        for nm, o in outs.items():
            a = np.asarray(o)[:3]
            d = np.abs(a - a0)
            print(f"v5 {nm} vs v0: max abs {d.max():.3e} "
                  f"(rel {d.max()/scale:.3e})", flush=True)


def main_v7():
    """Round-4 bounded retry (VERDICT r3 #8): the banded static
    half-pair A/B'd against production v0 at any N (default 1M)."""
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 1_048_576
    key = jax.random.PRNGKey(0)
    pos = jax.random.uniform(key, (4, n), jnp.float32, -400.0, 400.0)
    pos = pos.at[3].set(0.0)
    print(f"v7 A/B: N={n}, backend={jax.default_backend()}", flush=True)

    def v0(p):
        return allpairs.all_pairs_accel_pallas(
            p, mass=MASS, softening_squared=EPS2)

    o0 = timeit("v0 baseline", v0, pos, n)
    best = None
    for t, kb in ((512, 64), (512, 128), (512, 256), (256, 256)):
        if n % t or (n // t) < 1:
            continue
        o = timeit(f"v7 banded t={t} kb={kb}",
                   lambda p, tt=t, kk=kb: v7_accel(p, t=tt, kb=kk), pos, n)
        if o is not None and o0 is not None:
            a0 = np.asarray(o0)[:3]
            a = np.asarray(o)[:3]
            rel = np.abs(a - a0).max() / np.abs(a0).max()
            print(f"   vs v0 rel {rel:.3e}", flush=True)






def _v7_kernel(pos_hbm, posT_i, iacc_out, jacc_out, buf, jacc, iacc, sem, *,
               j0_tiles, kb, tj, eps2):
    """Banded static half-pair (round 4, VERDICT #8 retry): the 0.193
    static-loop + predicated-body structure, with the j-side accumulator
    holding ONE BAND of kb j-tiles in VMEM (4*kb*tj floats) instead of
    the whole [4, N] (which hits the 16 MiB scoped limit past ~250K).
    One pallas_call per band; i-partials sum across bands by linearity."""
    pid = pl.program_id(0)            # i-tile index, 0..ni-1 (ni = j0+kb)
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
        @pl.when(j0_tiles + jloc >= pid)
        def _():
            slot = jax.lax.rem(jloc, 2)

            @pl.when(jloc + 1 < kb)
            def _():
                dma(1 - slot, jloc + 1).start()

            dma(slot, jloc).wait()
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

    ni = j0_tiles + kb

    @pl.when(pid == ni - 1)
    def _():
        jacc_out[...] = jacc[...]


@functools.partial(jax.jit, static_argnames=("t", "kb"))
def v7_accel(position, t=512, kb=128):
    """Half-pair at ANY N: one banded triangle pass per kb-j-tile band."""
    n = position.shape[1]
    posT = position.T
    nt = n // t
    acc = jnp.zeros((3, n), jnp.float32)
    for j0 in range(0, nt, kb):
        kbb = min(kb, nt - j0)
        ni = j0 + kbb                      # i-tiles participating
        nb = kbb * t                       # band width in particles
        kernel = functools.partial(_v7_kernel, j0_tiles=j0, kb=kbb,
                                   tj=t, eps2=EPS2)
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
    a3 = acc * jnp.float32(MASS)
    amag = jnp.sqrt(jnp.sum(a3 * a3, axis=0, keepdims=True))
    return jnp.concatenate([a3, amag], axis=0)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "v7":
        main_v7()
    else:
        main()
