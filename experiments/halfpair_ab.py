"""Halfpair vs rectangle all-pairs kernel: trajectory-quality A/B
(VERDICT r4 #5 — resolve the headline/default mismatch with evidence).

The two kernels compute the same softened-gravity pair sum in different
accumulation orders (rect: j-tile scan per target; halfpair: Newton-3rd
banded accumulation). Each is individually deterministic; the question
is whether either order is ACCURATE-worse, which decides if halfpair
(+12.3% throughput) can be the single-chip default.

Three measurements on the demo init:

1. Single-step accel accuracy vs float64 ground truth @262K: the exact
   f64 pair sum on K=4096 sampled targets (all 262K sources, host
   NumPy, chunked), RMS relative error of each kernel's f32 accel.
2. Energy drift over 1000 steps @65K (each kernel): symplectic Euler +
   exact forces keep synchronized energy bounded — accumulation-order
   noise would pump it. Sampled every 100 steps via the exact O(N²)
   potential gauge.
3. Chaos-normalized divergence @65K: rect-vs-halfpair trajectory RMS
   distance after k steps, compared against the SAME-kernel divergence
   from a 1-ULP single-particle perturbation (the chaotic-systems
   yardstick: if kernel-vs-kernel ~ ULP-vs-ULP, the orders are
   interchangeable and neither trajectory is privileged).

Run DETACHED (optionally select parts, e.g. `... halfpair_ab.py 3`):
  nohup python experiments/halfpair_ab.py > /tmp/halfpair_ab.log 2>&1 &

RESULTS (on-chip v5e, 2026-08-20) — the A/B that made halfpair the
single-chip default (config.py `all_pairs_half = True`):

1. accel RMS vs f64 @262K: rect 9.9e-08, halfpair 1.9e-07 — both at
   f32 rounding noise; neither order is accuracy-privileged.
2. worst |energy drift| over 1000 steps @65K: rect 2.60e-05,
   halfpair 2.08e-05 — equal-or-better.
3. chaos-normalized divergence @65K: rect-vs-half RMS distance
   5.98e-9 / 1.20e-8 / 2.89e-8 / 1.04e-7 at steps 50/100/200/400 vs
   the same-kernel 1-ULP yardstick 2.54e-10 / 4.86e-10 / 1.28e-9 /
   7.35e-9 — a steady ~14-25x, i.e. switching kernels perturbs the
   trajectory like a few-ULP nudge of one coordinate: the same
   chaotic equivalence class, not a physics difference.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def exact_f64_accel(pos_np, targets, mass, eps2, scale):
    """f64 exact accel for `targets` (indices) against ALL sources."""
    p = pos_np[:3].astype(np.float64)          # [3, N]
    n = p.shape[1]
    out = np.zeros((3, len(targets)))
    tp = p[:, targets]                          # [3, K]
    for lo in range(0, n, 32768):
        hi = min(lo + 32768, n)
        src = p[:, lo:hi]                       # [3, S]
        d = src[:, None, :] - tp[:, :, None]    # [3, K, S]
        d2 = (d * d).sum(axis=0) + eps2
        s = 1.0 / (d2 * np.sqrt(d2))
        out += (d * s[None]).sum(axis=2)
    return out * (mass * scale)


def rms_rel(a, b):
    """RMS of |a-b| over RMS of |b| (per-component norm)."""
    return float(np.sqrt(((a - b) ** 2).sum()) / np.sqrt((b ** 2).sum()))


def main():
    from multi_adapter_particles_tpu.config import SimConfig
    from multi_adapter_particles_tpu.models import (
        diagnostics, init as pinit, integrator,
    )
    from multi_adapter_particles_tpu.models.state import ParticleState
    from multi_adapter_particles_tpu.ops import allpairs

    parts = set(sys.argv[1:]) or {"1", "2", "3"}
    print(f"backend={jax.default_backend()} parts={sorted(parts)}",
          flush=True)

    # ---- 1. single-step accel accuracy vs f64 @262K ----------------------
    if "1" in parts:
        n = 262_144
        cfg = SimConfig(num_particles=n, force_model="all_pairs")
        state = pinit.initialize_particles_device(n, seed=42)
        pos_np = np.asarray(state.position)
        kernels = {}
        for label, half in (("rect", False), ("halfpair", True)):
            fn = allpairs.make_accel_fn(
                mass=cfg.mass, softening_squared=cfg.softening_squared,
                interaction_scale=cfg.interaction_scale, half=half,
            )
            acc = np.asarray(fn(state.position))
            kernels[label] = acc
            print(f"{label} accel computed", flush=True)
        rng = np.random.default_rng(0)
        targets = np.sort(rng.choice(n, 4096, replace=False))
        t0 = time.perf_counter()
        ref = exact_f64_accel(
            pos_np, targets, cfg.mass, cfg.softening_squared,
            cfg.interaction_scale,
        )
        print(f"f64 reference ({time.perf_counter()-t0:.0f}s)", flush=True)
        for label, acc in kernels.items():
            e = rms_rel(acc[:, targets].astype(np.float64), ref)
            print(f"ACCEL RMS vs f64 @262K  {label:9s} {e:.3e}", flush=True)

    # ---- 2. energy drift over 1000 steps @65K ----------------------------
    n2 = 65_536
    cfg2 = SimConfig(num_particles=n2, force_model="all_pairs")
    diag = diagnostics.make_diagnostics(cfg2, potential_mode="exact")
    for label, half in (("rect", False), ("halfpair", True)) \
            if "2" in parts else ():
        fn = allpairs.make_accel_fn(
            mass=cfg2.mass, softening_squared=cfg2.softening_squared,
            interaction_scale=cfg2.interaction_scale, half=half,
        )
        step = integrator.make_step(cfg2, accel_fn=fn, donate=False)
        s = pinit.initialize_particles_device(n2, seed=42)
        e0 = float(diag(s)["energy"])
        worst = 0.0
        t0 = time.perf_counter()
        for k in range(10):
            for _ in range(100):
                s = step(s)
            e = float(diag(s)["energy"])
            worst = max(worst, abs(e - e0) / abs(e0))
            print(f"  {label} step {100*(k+1):4d}: drift "
                  f"{(e-e0)/abs(e0):+.3e}", flush=True)
        print(f"ENERGY DRIFT 1000 steps @65K {label:9s} worst {worst:.3e} "
              f"({time.perf_counter()-t0:.0f}s)", flush=True)

    # ---- 3. chaos-normalized divergence @65K ------------------------------
    def run(half, perturb, steps=400):
        fn = allpairs.make_accel_fn(
            mass=cfg2.mass, softening_squared=cfg2.softening_squared,
            interaction_scale=cfg2.interaction_scale, half=half,
        )
        step = integrator.make_step(cfg2, accel_fn=fn, donate=False)
        s = pinit.initialize_particles_device(n2, seed=42)
        if perturb:
            p = np.array(s.position)  # writable copy
            p[0, 0] = np.nextafter(p[0, 0], np.inf, dtype=np.float32)
            s = ParticleState(jnp.asarray(p), s.velocity)
        snaps = {}
        for k in range(steps + 1):
            if k in (50, 100, 200, 400):
                snaps[k] = np.asarray(s.position[:3, :n2])
            s = step(s)
        return snaps

    if "3" not in parts:
        return 0
    a = run(False, False)
    b = run(True, False)
    c = run(False, True)
    for k in (50, 100, 200, 400):
        div_ab = rms_rel(b[k].astype(np.float64), a[k].astype(np.float64))
        div_ac = rms_rel(c[k].astype(np.float64), a[k].astype(np.float64))
        print(f"DIVERGENCE step {k:4d}: rect-vs-half {div_ab:.3e} | "
              f"rect-vs-rect(1ulp) {div_ac:.3e} | ratio "
              f"{div_ab/max(div_ac, 1e-30):.2f}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
