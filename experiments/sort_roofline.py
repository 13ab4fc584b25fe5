"""Sort roofline @4M-render shapes (VERDICT r4 #1a): what fraction of this
chip's attainable sort throughput is the production 65 ms?

The 4M render's documented roof is the multi-operand comparator sort
(65 of ~95 ms device, op-profile 2026-08-19): four 1M-particle chunks,
each sorting E = 4.2M entries with 5 operands (i32 tile key + cx, cy, w,
cgb f32 payloads), stable. BASELINE.md's all-pairs section closed its
axis with op attribution + a computed ceiling; this harness does the
same for the sort axis:

  1. `jax.lax.sort` cost curve over E in {2^19..2^24} at the production
     operand mix (key + 4 f32, stable) — the per-shard sizes the
     multi-chip scaling model needs (VERDICT #2).
  2. Operand-count sweep at E = 2^22 and 2^24 (key alone, +1, +2, +4):
     confirms the per-operand scaling measured at 1M holds at 16x.
  3. Data-(in)dependence check: uniform keys vs the renderer's real
     distribution (63% sentinel tail, live keys skewed into cluster
     tiles) at the same shape — comparator networks are oblivious, so
     these should tie; a tie certifies that microbench numbers transfer
     to production's key distribution.
  4. Stability + key-width contrast at 2^24 (unstable, u32 key).

Roofline math (applied to the results in BASELINE.md): XLA's TPU sort
is a stable local-block sort + ceil(log2(E/B)) global merge passes;
every pass streams all operands through HBM once each way. With B =
2^15 (the VMEM-resident block size measured in the round-3 bitonic
work), E = 2^22 has 7 global passes + the local pass = 8 full-array
round trips; bytes moved >= 2 dirs * 4 B * k operands * E * passes.
Attained bytes/s = that / measured t, vs v5e HBM ~819 GB/s.

Run DETACHED:
  nohup python experiments/sort_roofline.py > /tmp/sort_roofline.log 2>&1 &

RESULTS (on-chip v5e, 2026-08-20, WALL ms — device attribution in
sort_roofline2.py):
  stable key+4f32: 2^19 19.7 | 2^20 17.9 | 2^21 22.1 | 2^22 38.7 |
    2^23 67.6 | 2^24 128.4   (~14 ms fixed dispatch floor below 2^21)
  operand sweep @2^22: key 9.6 | +1 15.3 | +2 19.7 | +4 38.7
               @2^24: key 41.7 | +1 60.9 | +2 84.6 | +4 128.4
  renderer-keys 32.7 vs presorted 31.2 vs uniform 38.7 @2^22 — wall
    noise; device time ties exactly (roofline2: 17.098 = 17.098)
  unstable @2^24 108.6 (-15%) | u32 key 121.1 vs i32 128.4
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

RESULTS = []


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
    RESULTS.append((name, ms))
    return ms


def sort_stable(*ops):
    return jax.lax.sort(ops, dimension=0, num_keys=1, is_stable=True)


def sort_unstable(*ops):
    return jax.lax.sort(ops, dimension=0, num_keys=1, is_stable=False)


def realistic_keys(rng, e):
    """The renderer's actual key profile at the demo scene: ~36.7% live
    entries skewed into cluster-core tiles, the rest at the sentinel
    (num_tiles), pre-sort order = particle-id-major (clusters make it
    locally correlated)."""
    num_tiles = 8192
    live = int(e * 0.367)
    # two Gaussian tile clusters (the projected demo scene)
    t = np.concatenate([
        rng.normal(2048, 180, live // 2),
        rng.normal(6144, 180, live - live // 2),
    ])
    t = np.clip(t, 0, num_tiles - 1).astype(np.int32)
    keys = np.full(e, num_tiles, np.int32)
    idx = rng.choice(e, size=live, replace=False)
    keys[idx] = t
    return jnp.asarray(keys)


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)
    js = jax.jit(sort_stable)
    ju = jax.jit(sort_unstable)

    # warm-up dispatch (tunnel warm-up happens here, ~2-4 min cold)
    t0 = time.perf_counter()
    _ = np.asarray(jnp.ones((8, 128)).sum())
    print(f"warm-up dispatch {time.perf_counter()-t0:.1f}s", flush=True)

    # 1. production-mix scaling curve (key + 4 f32, stable)
    for lg in (19, 20, 21, 22, 23, 24):
        e = 1 << lg
        key = jnp.asarray(rng.integers(0, 8192, e, dtype=np.int32))
        pl = [jnp.asarray(rng.random(e, dtype=np.float32)) for _ in range(4)]
        reps = 10 if lg <= 22 else 5
        bench(f"stable key+4f32  E=2^{lg}", js, (key, *pl), reps=reps)
        del key, pl

    # 2. operand sweep at the chunk size and the full-4M size
    for lg in (22, 24):
        e = 1 << lg
        key = jnp.asarray(rng.integers(0, 8192, e, dtype=np.int32))
        pl = [jnp.asarray(rng.random(e, dtype=np.float32)) for _ in range(4)]
        reps = 10 if lg <= 22 else 5
        bench(f"stable key alone E=2^{lg}", js, (key,), reps=reps)
        for p in (1, 2):
            bench(f"stable key+{p}f32  E=2^{lg}", js, (key, *pl[:p]),
                  reps=reps)
        del key, pl

    # 3. oblivious check: realistic renderer keys vs uniform, same shape
    e = 1 << 22
    pl = [jnp.asarray(rng.random(e, dtype=np.float32)) for _ in range(4)]
    rk = realistic_keys(rng, e)
    bench("stable key+4f32  E=2^22 RENDERER-KEYS", js, (rk, *pl))
    sk = jax.jit(lambda k, *o: jax.lax.sort((k, *o), dimension=0,
                                            num_keys=1, is_stable=True))
    presorted = jnp.sort(rk)
    bench("stable key+4f32  E=2^22 PRESORTED-KEYS", sk, (presorted, *pl))
    del rk, presorted

    # 4. stability / key-width contrast at the full size
    e = 1 << 24
    key = jnp.asarray(rng.integers(0, 8192, e, dtype=np.int32))
    pl4 = [jnp.asarray(rng.random(e, dtype=np.float32)) for _ in range(4)]
    bench("UNSTABLE key+4f32 E=2^24", ju, (key, *pl4), reps=5)
    ku = key.astype(jnp.uint32)
    bench("stable u32key+4f32 E=2^24", js, (ku, *pl4), reps=5)

    print("\nRESULTS_JSON", flush=True)
    import json
    print(json.dumps(RESULTS), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
