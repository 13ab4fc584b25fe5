"""Can a Pallas DMA pipeline beat XLA's row gather?

The PM interp gathers one [32]-float row per particle from a [G³, 32]
table — 4M rows @ ~38 ns/row under XLA's native gather (153 ms at
4M/G=128), i.e. 3.3 GB/s of a ~800 GB/s chip: latency/issue-bound, not
bandwidth-bound. This measures whether a hand-rolled Pallas kernel —
scalar-prefetched indices + a DEPTH-deep ring of single-row async
copies — can hide the HBM latency better, or whether per-DMA scalar
issue cost pins it to the same rate.

Run on the real chip:  python experiments/rowgather_pallas.py [N] [R] [W]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gather_kernel(idx_ref, table_hbm, out, scratch, sems, *, tile, depth):
    def copy(j, slot):
        r = idx_ref[j]
        return pltpu.make_async_copy(
            table_hbm.at[pl.ds(r, 1), :],
            scratch.at[pl.ds(j, 1), :],
            sems.at[slot],
        )

    def start(j):
        copy(j, jax.lax.rem(j, depth)).start()

    def wait(j):
        copy(j, jax.lax.rem(j, depth)).wait()

    for j in range(depth):
        start(j)

    def body(j, carry):
        wait(j)

        @pl.when(j + depth < tile)
        def _():
            start(j + depth)

        return carry

    jax.lax.fori_loop(0, tile, body, 0)
    out[...] = scratch[...]


@functools.partial(jax.jit, static_argnames=("tile", "depth"))
def pallas_gather(table, idx, tile=1024, depth=16):
    n = idx.shape[0]
    w = table.shape[1]
    return pl.pallas_call(
        functools.partial(_gather_kernel, tile=tile, depth=depth),
        grid=(n // tile,),
        in_specs=[
            pl.BlockSpec((tile,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (tile, w), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((tile, w), table.dtype),
            pltpu.SemaphoreType.DMA((depth,)),
        ],
        out_shape=jax.ShapeDtypeStruct((n, w), table.dtype),
    )(idx, table)


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4_194_304
    r = int(sys.argv[2]) if len(sys.argv) > 2 else 2_097_152
    w = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    reps = 5
    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (r, w), jnp.float32)
    idx = jax.random.randint(jax.random.PRNGKey(1), (n,), 0, r, jnp.int32)
    print(f"backend={jax.default_backend()} n={n} table=[{r},{w}]",
          flush=True)

    out_x = table[idx]
    float(out_x[0, 0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out_x = table[idx]
    float(out_x[0, 0])
    ms_x = (time.perf_counter() - t0) * 1000 / reps
    print(f"XLA gather:    {ms_x:8.2f} ms  ({ms_x*1e6/n:.1f} ns/row)",
          flush=True)

    try:
        out_p = pallas_gather(table, idx)
        float(out_p[0, 0])
        ok = bool(jnp.all(out_p == out_x))
        t0 = time.perf_counter()
        for _ in range(reps):
            out_p = pallas_gather(table, idx)
        float(out_p[0, 0])
        ms_p = (time.perf_counter() - t0) * 1000 / reps
        print(f"Pallas gather: {ms_p:8.2f} ms  ({ms_p*1e6/n:.1f} ns/row)"
              f"  match={ok}", flush=True)
    except Exception as e:  # noqa: BLE001 — experiment: report and move on
        print(f"Pallas gather failed: {type(e).__name__}: {e}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
