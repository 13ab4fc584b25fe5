"""Micro-variants for the two renderer hot stages (sort 7.1 ms, rowbuild
8.9 ms of the 22.6 ms @262K frame — experiments/render_profile.py).

1. sort operand scaling: is the 'payloads ride free' anchor (measured at
   16.8M) still true at E=1M, or does per-operand cost dominate there?
2. rowbuild: 8 separate [data_rows, Q] row-gathers + stack + transpose
   (production) vs ONE packed [data_rows, 8*Q] gather + reshape/transpose
   vs feeding the kernel V-major (gather output) layout directly.
3. combine: static log2(max_segs) masked passes vs while_loop bounded by
   the ACTUAL max segment count of the frame.

Run on the real chip:  python experiments/render_variants.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, reps=20):
    out = fn(*args)
    jax.tree_util.tree_map(
        lambda x: float(jax.device_get(x.ravel()[0])), out
    )
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.tree_util.tree_map(
        lambda x: float(jax.device_get(x.ravel()[0])), out
    )
    return (time.perf_counter() - t0) * 1000 / reps


def main() -> int:
    print(f"backend={jax.default_backend()}", flush=True)
    e = 1_048_576
    rng = np.random.default_rng(0)
    key = jnp.asarray(
        rng.integers(0, 8193, size=e, dtype=np.int32)
    )
    pay = [
        jnp.asarray(rng.uniform(0, 1, size=e).astype(np.float32))
        for _ in range(8)
    ]

    # --- 1. sort operand scaling -----------------------------------------
    for k in (0, 1, 3, 7):
        f = jax.jit(
            lambda key, *ops: jax.lax.sort(
                (key, *ops), dimension=0, num_keys=1, is_stable=True
            )
        )
        ms = timeit(f, key, *pay[:k])
        print(f"sort 1 key + {k} payloads @1M: {ms:7.2f} ms", flush=True)

    # --- 2. rowbuild variants --------------------------------------------
    q = 64
    data_rows = e // q
    v = 24576
    j_v = jnp.asarray(
        np.sort(rng.integers(0, data_rows, size=v)).astype(np.int32)
    )

    @jax.jit
    def build_separate(j_v, *srt):
        outs = [a.reshape(data_rows, q)[j_v] for a in srt]   # 8 row-gathers
        sp = jnp.stack(outs, axis=0)                         # [8, V, Q]
        return sp.transpose(0, 2, 1)                         # [8, Q, V]

    @jax.jit
    def build_packed(j_v, *srt):
        packed = jnp.stack(srt, axis=1)                      # [E, 8] rows
        packed = packed.reshape(data_rows, q, 8)
        packed = packed.transpose(0, 2, 1).reshape(data_rows, 8 * q)
        rows = packed[j_v]                                   # ONE gather
        return rows.reshape(v, 8, q).transpose(1, 2, 0)      # [8, Q, V]

    @jax.jit
    def build_vmajor(j_v, *srt):
        packed = jnp.stack(srt, axis=1)                      # [E, 8]
        packed = packed.reshape(data_rows, q, 8)
        packed = packed.transpose(0, 2, 1).reshape(data_rows, 8 * q)
        return packed[j_v].reshape(v, 8, q)                  # [V, 8, Q]

    ms = timeit(build_separate, j_v, *pay)
    print(f"rowbuild separate (prod): {ms:7.2f} ms", flush=True)
    ms = timeit(build_packed, j_v, *pay)
    print(f"rowbuild packed one-gather: {ms:7.2f} ms", flush=True)
    ms = timeit(build_vmajor, j_v, *pay)
    print(f"rowbuild packed V-major (no final T): {ms:7.2f} ms", flush=True)

    # --- 3. combine: static vs dynamic pass count ------------------------
    px = 128
    nrows = v
    max_segs = data_rows + 1
    segs_v = jnp.asarray(
        np.minimum(rng.geometric(0.5, size=nrows), 40).astype(np.int32)
    )
    seg_v = jnp.asarray((np.arange(nrows) % 7).astype(np.int32))
    chans0 = [
        jnp.asarray(rng.uniform(0, 1, (nrows, px)).astype(np.float32))
        for _ in range(3)
    ]
    tv0 = jnp.asarray(rng.uniform(0, 1, (nrows, px)).astype(np.float32))

    def one_pass(s, chans, tv):
        take = ((seg_v % (2 * s) == 0) & (seg_v + s < segs_v))[:, None]
        part_t = jnp.concatenate(
            [tv[s:], jnp.ones((s, px), jnp.float32)], axis=0
        )
        new_chans = []
        for c in range(3):
            part_c = jnp.concatenate(
                [chans[c][s:], jnp.zeros((s, px), jnp.float32)], axis=0
            )
            new_chans.append(
                jnp.where(take, chans[c] * part_t + part_c, chans[c])
            )
        tv = jnp.where(take, tv * part_t, tv)
        return new_chans, tv

    @jax.jit
    def combine_static(chans, tv):
        passes = max(max_segs - 1, 0).bit_length()
        for p in range(passes):
            chans, tv = one_pass(1 << p, chans, tv)
        return chans[0]

    def one_pass_dyn(s, chans, tv):
        # s traced: shift rows with roll + tail mask (identity values)
        rowid = jnp.arange(nrows, dtype=jnp.int32)[:, None]
        in_range = rowid < (nrows - s)
        take = ((seg_v % (2 * s) == 0) & (seg_v + s < segs_v))[:, None]
        part_t = jnp.where(
            in_range, jnp.roll(tv, -s, axis=0), 1.0
        )
        new_chans = []
        for c in range(3):
            part_c = jnp.where(
                in_range, jnp.roll(chans[c], -s, axis=0), 0.0
            )
            new_chans.append(
                jnp.where(take, chans[c] * part_t + part_c, chans[c])
            )
        tv = jnp.where(take, tv * part_t, tv)
        return new_chans, tv

    @jax.jit
    def combine_dynamic(chans, tv):
        maxseg = jnp.max(segs_v)

        def cond(carry):
            s, _, _ = carry
            return s < maxseg

        def body(carry):
            s, chans, tv = carry
            chans, tv = one_pass_dyn(s, chans, tv)
            return (s * 2, chans, tv)

        _, chans, tv = jax.lax.while_loop(cond, body, (1, chans, tv))
        return chans[0]

    ms = timeit(combine_static, chans0, tv0)
    print(f"combine static {max(max_segs - 1, 0).bit_length()} passes: "
          f"{ms:7.2f} ms", flush=True)
    try:
        ms = timeit(combine_dynamic, chans0, tv0)
        print(f"combine dynamic (max actual): {ms:7.2f} ms", flush=True)
    except Exception as ex:  # dynamic shifts may not compile
        print(f"combine dynamic failed: {type(ex).__name__}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
