"""Comparator-sort cost matrix @1M entries (the renderer's sort floor).

The tile-binned renderer's stable multi-operand sort is ~9 ms of the
17.25 ms @262K/720p device frame (E = N*dup = 1M entries, key + 4 f32
payloads). Questions this answers on the real chip:

  1. does sort cost scale with BYTES (then f16/u16 operands halve it) or
     with OPERAND COUNT (then packing 2xf16 into f32 lanes is the lever)?
  2. what does dropping one payload save (the rel-f16 center repack plan:
     key + [relx|rely] + [g|b] + w = 4 operands vs today's 5)?
  3. is a u16 key cheaper than i32?

Run DETACHED:  nohup python experiments/sort_cost.py > /tmp/sort_cost.log 2>&1 &
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

E = 1 << 20
KEYMAX = 7200  # 720p tile count


def bench(name, fn, args, reps=20):
    out = fn(*args)
    jax.tree_util.tree_map(
        lambda x: np.asarray(jax.device_get(x.ravel()[0])), out
    )
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.tree_util.tree_map(
        lambda x: np.asarray(jax.device_get(x.ravel()[0])), out
    )
    ms = (time.perf_counter() - t0) * 1000.0 / reps
    print(f"{name:<48} {ms:7.3f} ms", flush=True)
    return ms


def main():
    print(f"backend={jax.default_backend()} E={E}", flush=True)
    rng = np.random.default_rng(0)
    key_i32 = jnp.asarray(rng.integers(0, KEYMAX, E, dtype=np.int32))
    key_u16 = key_i32.astype(jnp.uint16)
    f32s = [jnp.asarray(rng.random(E, dtype=np.float32)) for _ in range(5)]
    f16s = [x.astype(jnp.float16) for x in f32s]
    bf16s = [x.astype(jnp.bfloat16) for x in f32s]

    def sort_n(*ops):
        return jax.lax.sort(ops, dimension=0, num_keys=1, is_stable=True)

    js = jax.jit(sort_n)
    bench("key i32 alone", js, (key_i32,))
    bench("key u16 alone", js, (key_u16,))
    for p in (1, 2, 3, 4, 5):
        bench(f"i32 key + {p} f32 payloads", js, (key_i32, *f32s[:p]))
    for p in (2, 3, 5):
        bench(f"i32 key + {p} f16 payloads", js, (key_i32, *f16s[:p]))
    for p in (3, 5):
        bench(f"i32 key + {p} bf16 payloads", js, (key_i32, *bf16s[:p]))
    bench("u16 key + 4 f32 payloads", js, (key_u16, *f32s[:4]))
    bench("u16 key + 2 f32 + 2 f16", js,
          (key_u16, f32s[0], f32s[1], f16s[2], f16s[3]))
    # unstable for contrast (production needs stable)
    def sort_u(*ops):
        return jax.lax.sort(ops, dimension=0, num_keys=1, is_stable=False)
    bench("UNSTABLE i32 key + 4 f32", jax.jit(sort_u), (key_i32, *f32s[:4]))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
