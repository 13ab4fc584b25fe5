"""All-pairs kernel v3: NaN-free MXU d^2 via centering + K-packed bf16 split.

Round-1 results (allpairs_v2.py): the [TJ, TI] MXU layout reaches 0.234
Tpairs/s with bf16 matmuls but NaNs (d^2 = ri2 + rj2 - 2 dot cancels to
~eps2 out of ~1e6 magnitudes; bf16's 8-bit mantissa leaves +-640 absolute
error -> negative d^2 -> rsqrt NaN). fp32 (HIGHEST, 6-pass) is 0.087.

v3 fixes the cancellation at ~bf16 cost:
- center each (i-block, j-tile) pair on the midpoint of the two tile
  centroids (fp32, O(TI+TJ) per tile) — shrinks |q| when tiles are
  spatially coherent and costs nothing when they aren't;
- split q = hi + lo (bf16 each; products of bf16 are EXACT in fp32) and
  pack the 4-term expansion into ONE matmul along K:
      dot = [hi|hi|lo|lo] @ [hi;lo;hi;lo]   (K = 12 instead of 3)
  so the full fp32-quality cross term costs one K=12 pass instead of the
  6-pass HIGHEST decomposition;
- ri2/rj2 stay fp32 on the VPU (they are positive — no cancellation).

Force path variants:
  v3a: force on VPU (sublane reduction over j), s stays fp32
  v3b: force as TWO bf16 matmuls with s split hi/lo (fp32-quality force)
  v3c: force as ONE bf16 matmul, s rounded to bf16 (cheapest, ~2^-9 rel)

Usage: python experiments/allpairs_v3.py [N]
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


def _split(q):
    hi = q.astype(jnp.bfloat16)
    lo = (q - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _v3_kernel(pos_hbm, pos_i, accel_out, buf, sem, *,
               num_j_tiles, tj, force_path):
    # pos_i: [4, TI]; planes [TJ, TI]: i on lanes, j on sublanes.
    ti = pos_i.shape[1]
    pi3 = pos_i[0:3, :]                                    # [3, TI] fp32
    ci = jnp.mean(pi3, axis=1, keepdims=True)              # [3, 1]

    def dma(slot, j):
        return pltpu.make_async_copy(
            pos_hbm.at[:, pl.ds(j * tj, tj)], buf.at[slot], sem.at[slot])

    dma(0, 0).start()

    def body(j, carry):
        acc3, accs = carry
        slot = jax.lax.rem(j, 2)

        @pl.when(j + 1 < num_j_tiles)
        def _():
            dma(1 - slot, j + 1).start()

        dma(slot, j).wait()
        tile = buf[slot]                                   # [4, TJ]
        pj3 = tile[0:3, :]
        cj = jnp.mean(pj3, axis=1, keepdims=True)
        c = 0.5 * (ci + cj)                                # [3, 1]
        qi = pi3 - c                                       # [3, TI] fp32
        qj = pj3 - c                                       # [3, TJ] fp32
        hi_i, lo_i = _split(qi)
        hi_j, lo_j = _split(qj)
        ri2 = jnp.sum(qi * qi, axis=0, keepdims=True) + jnp.float32(EPS2)
        rj2 = jnp.sum(qj * qj, axis=0, keepdims=True)      # [1, TJ]

        # ONE K=12 matmul: all four split products, each exact in fp32.
        wj = jnp.concatenate([hi_j, hi_j, lo_j, lo_j], axis=0)  # [12, TJ]
        vi = jnp.concatenate([hi_i, lo_i, hi_i, lo_i], axis=0)  # [12, TI]
        dot = jax.lax.dot_general(
            wj.T, vi, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                  # [TJ, TI]
        d2 = (ri2 - 2.0 * dot) + rj2.T                     # fp32 adds
        inv = jax.lax.rsqrt(d2)
        s = inv * inv * inv                                # [TJ, TI]

        if force_path == "vpu":
            # sum_j (xj - xi) s = sum_j qj*s - qi * sum_j s (the c cancels)
            f3 = jnp.stack([
                jnp.sum(qj[0][:, None] * s, axis=0),
                jnp.sum(qj[1][:, None] * s, axis=0),
                jnp.sum(qj[2][:, None] * s, axis=0),
            ])                                             # [3, TI]
            fs = jnp.sum(s, axis=0, keepdims=True)         # [1, TI]
            return acc3 + (f3 - qi * fs), accs
        # matmul force paths: F3[c, i] = sum_j qj[c, j] s[j, i], and the
        # -qi * sum_j s correction needs sum_j s — pack a ones row.
        if force_path == "mm_split":
            sh, sl = _split(s)
            lhs_h = jnp.concatenate(
                [hi_j, lo_j, jnp.ones((1, tj), jnp.bfloat16)], axis=0)
            lhs_l = jnp.concatenate(
                [hi_j, jnp.ones((1, tj), jnp.bfloat16)], axis=0)
            f_h = jax.lax.dot_general(
                lhs_h, sh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)        # [7, TI]
            f_l = jax.lax.dot_general(
                lhs_l, sl, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)        # [4, TI]
            f3 = (f_h[0:3] + f_h[3:6]) + f_l[0:3]
            fs = f_h[6:7] + f_l[3:4]
        else:  # mm_bf16
            sh = s.astype(jnp.bfloat16)
            lhs = jnp.concatenate(
                [hi_j, lo_j, jnp.ones((1, tj), jnp.bfloat16)], axis=0)
            f = jax.lax.dot_general(
                lhs, sh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)        # [7, TI]
            f3 = f[0:3] + f[3:6]
            fs = f[6:7]
        acc3 = acc3 + (f3 - qi * fs)
        return acc3, accs

    zero3 = jnp.zeros((3, ti), jnp.float32)
    zeros = jnp.zeros((1, ti), jnp.float32)
    acc3, _ = jax.lax.fori_loop(0, num_j_tiles, body, (zero3, zeros))
    m = jnp.float32(MASS)
    a3 = m * acc3
    amag = jnp.sqrt(jnp.sum(a3 * a3, axis=0, keepdims=True))
    accel_out[:, :] = jnp.concatenate([a3, amag], axis=0)


@functools.partial(jax.jit, static_argnames=("ti", "tj", "force_path"))
def v3_accel(position, ti=512, tj=512, force_path="vpu"):
    n = position.shape[1]
    kernel = functools.partial(
        _v3_kernel, num_j_tiles=n // tj, tj=tj, force_path=force_path)
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
            flops=int(n) * int(n) * 30,
            bytes_accessed=int(n) * 16 * (n // ti + 2),
            transcendentals=int(n) * int(n)),
        interpret=interpret_flag(),
    )(position, position)


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
    for fp in ("vpu", "mm_split", "mm_bf16"):
        for tjv in (512, 1024):
            o = timeit(f"v3 {fp} tj={tjv}",
                       lambda p, f=fp, t=tjv: v3_accel(p, tj=t, force_path=f),
                       pos, n)
            if o is not None:
                outs[f"{fp} tj={tjv}"] = o

    if o0 is not None:
        a0 = np.asarray(o0)[:3]
        scale = np.abs(a0).max()
        for nm, o in outs.items():
            a = np.asarray(o)[:3]
            d = np.abs(a - a0)
            print(f"v3 {nm} vs v0: max abs {d.max():.3e} "
                  f"(rel {d.max()/scale:.3e}), nan={np.isnan(a).any()}",
                  flush=True)


if __name__ == "__main__":
    main()
