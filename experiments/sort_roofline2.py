"""Sort roofline, part 2: DEVICE-time attribution of standalone
`jax.lax.sort` at the production shapes (VERDICT r4 #1a).

Part 1 (sort_roofline.py, 2026-08-20) measured WALL time and found a
~13-15 ms fixed floor per standalone call below E=2^21 — wall numbers
mix the sort op with dispatch/layout overhead, while the production
op-profile attributes only the sort HLO (65 ms across four E=4.2M chunk
sorts = ~16.3 ms each @4M render). This harness profiles standalone
sorts under the XLA profiler and splits device time into sort ops vs
everything else, at the exact production operand mix (i32 key + 4 f32,
stable) and the renderer's key distribution — giving the apples-to-apples
"XLA attainable" ceiling the production sort is measured against.

Run DETACHED:
  nohup python experiments/sort_roofline2.py > /tmp/sort_roofline2.log 2>&1 &

RESULTS (on-chip v5e, 2026-08-20, DEVICE sort-op ms via profiler —
the numbers BASELINE.md's render-sort roofline is built on):
  E=2^20: sort-op  3.080 | other-dev 0.015 | wall 21.9
  E=2^22: sort-op 17.098 | other-dev 0.059 | wall 31.3
  E=2^24: sort-op 92.582 | other-dev 0.174 | wall 108.6
  E=2^22 renderer-key distribution: sort-op 17.098 — EXACTLY uniform's
    (comparator networks are data-oblivious; microbench transfers)
  Production: 4 chunk sorts x 17.10 = 68.4 predicted vs 65 measured
  in-pipeline = AT the XLA sort ceiling; per-entry cost grows ~0.65
  ns/doubling (2.94/4.08/5.52 ns at 2^20/22/24), so chunked 4x2^22
  (68.4) beats one 2^24-class sort (92.6) — the round-4 chunking win.
"""

import glob
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

REPS = 10


def renderer_keys(rng, e):
    num_tiles = 8192
    live = int(e * 0.367)
    t = np.concatenate([
        rng.normal(2048, 180, live // 2),
        rng.normal(6144, 180, live - live // 2),
    ])
    t = np.clip(t, 0, num_tiles - 1).astype(np.int32)
    keys = np.full(e, num_tiles, np.int32)
    idx = rng.choice(e, size=live, replace=False)
    keys[idx] = t
    return jnp.asarray(keys)


def profile_device_ms(fn, args, reps=REPS):
    """-> (sort_ms_per_call, other_ms_per_call, wall_ms_per_call)."""
    out = fn(*args)  # compile
    jax.tree_util.tree_map(
        lambda x: np.asarray(jax.device_get(x.ravel()[0])), out
    )
    log_dir = tempfile.mkdtemp(prefix="sortroof2_")
    try:
        opts = jax.profiler.ProfileOptions()
        opts.python_tracer_level = 0
        opts.host_tracer_level = 0
        jax.profiler.start_trace(log_dir, profiler_options=opts)
    except TypeError:
        jax.profiler.start_trace(log_dir)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.tree_util.tree_map(
        lambda x: np.asarray(jax.device_get(x.ravel()[0])), out
    )
    wall = (time.perf_counter() - t0) * 1000.0 / reps
    jax.profiler.stop_trace()

    from jax.profiler import ProfileData

    sort_ns = 0.0
    other_ns = 0.0
    op_rows = {}
    paths = glob.glob(os.path.join(log_dir, "**", "*.xplane.pb"),
                      recursive=True)
    for path in paths:
        pd = ProfileData.from_serialized_xspace(open(path, "rb").read())
        for plane in pd.planes:
            if "TPU" not in plane.name and "Device" not in plane.name:
                continue
            for line in plane.lines:
                if line.name != "XLA Ops":
                    continue
                for ev in line.events:
                    d = getattr(ev, "duration_ns", None)
                    if d is None:
                        continue
                    if "sort" in ev.name.lower():
                        sort_ns += d
                    else:
                        other_ns += d
                    op_rows[ev.name] = op_rows.get(ev.name, 0.0) + d
    top = sorted(op_rows.items(), key=lambda kv: -kv[1])[:8]
    for nm, ns in top:
        print(f"      {ns/1e6/reps:8.3f} ms  {nm[:90]}", flush=True)
    return sort_ns / 1e6 / reps, other_ns / 1e6 / reps, wall


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)

    def sort5(*ops):
        return jax.lax.sort(ops, dimension=0, num_keys=1, is_stable=True)

    js = jax.jit(sort5)
    _ = np.asarray(jnp.ones((8, 128)).sum())
    print("warm", flush=True)

    results = []
    for lg in (20, 22, 24):
        e = 1 << lg
        key = renderer_keys(rng, e)
        pl = [jnp.asarray(rng.random(e, dtype=np.float32)) for _ in range(4)]
        print(f"E=2^{lg} stable key+4f32 (renderer keys):", flush=True)
        s, o, w = profile_device_ms(js, (key, *pl))
        print(f"  sort-op {s:8.3f} ms | other-dev {o:8.3f} | wall {w:8.3f}",
              flush=True)
        results.append((lg, s, o, w))
        del key, pl

    # the production CHUNK config, uniform keys, for the oblivious check
    e = 1 << 22
    keyu = jnp.asarray(rng.integers(0, 8192, e, dtype=np.int32))
    pl = [jnp.asarray(rng.random(e, dtype=np.float32)) for _ in range(4)]
    print("E=2^22 stable key+4f32 (uniform keys):", flush=True)
    s, o, w = profile_device_ms(js, (keyu, *pl))
    print(f"  sort-op {s:8.3f} ms | other-dev {o:8.3f} | wall {w:8.3f}",
          flush=True)
    results.append(("22u", s, o, w))

    import json
    print("RESULTS_JSON", flush=True)
    print(json.dumps(results), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
