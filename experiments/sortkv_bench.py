"""VMEM bitonic sort vs XLA lax.sort on the renderer's shape.

The render sort (i32 key + 3 f32 payloads, E = 2^20) measured 9.7-11.8 ms
via lax.sort — HBM-pass-bound (experiments/sort_cost.py). The blocked
bitonic network (ops/sortkv.py) keeps every distance < 2^bl on-chip; this
measures it against lax.sort at E = 2^20 and 2^22 (the 1M-particle
render), across block sizes, plus correctness vs the stable reference.

Run DETACHED: nohup python experiments/sortkv_bench.py > /tmp/sortkv_bench.log 2>&1 &
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from multi_adapter_particles_tpu.ops.sortkv import sort_kv_stable


def sync(xs):
    for x in xs:
        np.asarray(jax.device_get(x.ravel()[0]))


def bench(fn, args, reps=20):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) * 1000.0 / reps, out


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)
    for e_log in (20, 22):
        e = 1 << e_log
        key = jnp.asarray(rng.integers(0, 7201, e, dtype=np.int32))
        ps = [jnp.asarray(rng.random(e, dtype=np.float32)) for _ in range(3)]

        def xla(k, a, b, c):
            return jax.lax.sort((k, a, b, c), dimension=0, num_keys=1,
                                is_stable=True)

        ms_ref, ref = bench(jax.jit(xla), (key, *ps))
        print(f"E=2^{e_log} lax.sort stable 4-op: {ms_ref:7.2f} ms",
              flush=True)

        for bl in (15, 16, 17):
            try:
                fn = lambda k, a, b, c: sort_kv_stable(  # noqa: E731
                    k, a, b, c, block_log2=bl
                )
                t0 = time.perf_counter()
                ms, out = bench(fn, (key, *ps))
                # correctness: key exact; payload equality vs stable ref
                ok = all(
                    np.array_equal(np.asarray(a), np.asarray(b))
                    for a, b in zip(out, ref)
                )
                print(
                    f"E=2^{e_log} sortkv bl={bl}: {ms:7.2f} ms "
                    f"({ms_ref/ms:.2f}x vs lax.sort) exact={ok} "
                    f"[first call {time.perf_counter()-t0:.0f}s]",
                    flush=True,
                )
            except Exception as ex:  # noqa: BLE001
                print(f"E=2^{e_log} sortkv bl={bl}: FAILED {type(ex).__name__}: {ex}",
                      flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
