"""Sort roofline, part 3: the last unpriced structural variant
(VERDICT r4 #1b) — can an UNSTABLE sort with an explicit id tiebreak
beat the stable sort production uses?

Part 1 measured unstable key+4f32 at 2^24 = 108.6 ms wall vs stable
128.4 (-15%). Production needs the stable ORDER (draw order within a
tile is particle-id order — 'over' blending is order-sensitive), but
stability can be re-encoded as a SECOND key: unstable sort on
(tile_key, id) with num_keys=2 yields exactly the stable permutation
(composite keys are unique). The question is whether
(unstable, 6 operands, 2 keys) < (stable, 5 operands, 1 key) at the
production chunk shape — the id operand and the extra comparator
chain fight the unstable saving.

Also re-measures the per-plane-split decomposition honestly: 4 stable
sorts of E/4 + ONE stable merge sort of the concatenation (the only
TPU-legal payload merge is another sort, and comparator networks are
data-oblivious — presortedness buys nothing, part 1 measured
PRESORTED 31.2 vs uniform 31.3 device-equivalent).

Run DETACHED:
  nohup python experiments/sort_roofline3.py > /tmp/sort_roofline3.log 2>&1 &

RESULTS (on-chip v5e, 2026-08-20) — both variants REJECTED:

  stable   (key)+4f32        E=2^22      34.698 ms
  UNSTABLE (key,id)+4f32     E=2^22      37.737 ms   (+8.8%)
    order equivalence @2^22: True
  stable   (key)+4f32        E=2^24     120.255 ms
  UNSTABLE (key,id)+4f32     E=2^24     123.667 ms   (+2.8%)
    order equivalence @2^24: True
  per-plane: 4x stable 2^20 + stable merge 2^22      40.208 ms (+16%)

The id-tiebreak unstable sort DOES reproduce the stable permutation
(verified), but the 6th operand + second comparator chain cost more
than unstable saves at both shapes. The per-plane split loses because
the only payload-carrying merge on this target is another full-size
stable sort — the 4 quarter sorts are pure overhead on top of it.
Production stays on the stable 5-operand sort (BASELINE.md roofline:
it is AT the XLA sort ceiling for its shape).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def bench(name, fn, args, reps=10):
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
    print(f"{name:<56} {ms:9.3f} ms", flush=True)
    return ms


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)
    _ = np.asarray(jnp.ones((8, 128)).sum())

    def stable5(*ops):
        return jax.lax.sort(ops, dimension=0, num_keys=1, is_stable=True)

    def unstable2k(*ops):
        return jax.lax.sort(ops, dimension=0, num_keys=2, is_stable=False)

    js = jax.jit(stable5)
    ju = jax.jit(unstable2k)

    for lg in (22, 24):
        e = 1 << lg
        key = jnp.asarray(rng.integers(0, 8192, e, dtype=np.int32))
        ident = jnp.arange(e, dtype=jnp.int32)
        pl = [jnp.asarray(rng.random(e, dtype=np.float32)) for _ in range(4)]
        reps = 10 if lg <= 22 else 5
        bench(f"stable   (key)+4f32        E=2^{lg}", js, (key, *pl),
              reps=reps)
        bench(f"UNSTABLE (key,id)+4f32     E=2^{lg}", ju,
              (key, ident, *pl), reps=reps)
        # the correctness check once per size: identical permutation
        a = jax.jit(stable5)(key, *pl)
        b = jax.jit(unstable2k)(key, ident, *pl)
        same = all(
            bool(jnp.array_equal(x, y)) for x, y in zip(a[1:], b[2:])
        )
        print(f"  order equivalence @2^{lg}: {same}", flush=True)
        del key, ident, pl

    # per-plane split at the chunk shape: 4 sorts of 2^20 + merge sort
    e = 1 << 22
    q = e // 4
    keys = [jnp.asarray(rng.integers(0, 8192, q, dtype=np.int32))
            for _ in range(4)]
    pls = [[jnp.asarray(rng.random(q, dtype=np.float32)) for _ in range(4)]
           for _ in range(4)]

    def plane_split(ks, ps):
        sorted_planes = [
            jax.lax.sort((k, *p), dimension=0, num_keys=1, is_stable=True)
            for k, p in zip(ks, ps)
        ]
        cat = [
            jnp.concatenate([sp[i] for sp in sorted_planes])
            for i in range(5)
        ]
        return jax.lax.sort(tuple(cat), dimension=0, num_keys=1,
                            is_stable=True)

    bench("per-plane: 4x stable 2^20 + stable merge 2^22",
          jax.jit(lambda *a: plane_split(a[:4], [a[4 + 4 * i:8 + 4 * i]
                                                 for i in range(4)])),
          (*keys, *[x for p in pls for x in p]))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
