"""Driver benchmark: headline kernel metric PLUS the BASELINE.md staged
configs, so BENCH_r*.json catches renderer/pipeline regressions too.

Prints ONE JSON line. Top-level keys are the headline metric
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "extra": [...]}
and "extra" carries the staged configs, each with its own vs_baseline:

  1. (headline) pairwise interactions/sec/chip, all-pairs force @1M fp32.
     Baseline: BASELINE.json north star 1e12 pairs/s/chip (framed for v5p;
     this runs on one v5e). Higher is better; vs_baseline = value/1e12.
  2. 256K + 720p split-mode frame time (full sim+draw loop, dispatch-ahead
     pacing) — BASELINE.json staged config #3. Baseline: the reference's
     60 FPS frame budget (16.67 ms, `/root/reference/README.md:12`).
     Lower is better; vs_baseline = 16.67/value (>1 = inside budget).
  3. Render-only ms at 262K, 1024x1024 (the reference's window,
     `Main-Particles.cpp:50`). Baseline: 35.9 ms = this repo's round-1
     measured value (regression gate). vs_baseline = 35.9/value
     (>1 = faster than round 1).
  4. pm_grid self-gravity step ms at 4M, G=128 (beyond-reference model).
     Baseline: 553 ms = this repo's round-1 measured value.
     vs_baseline = 553/value (>1 = faster than round 1).
  5. (round 4+) THE REFERENCE'S SHIPPED DEFAULT: central-well sim at
     N = 4,194,304 (`/root/reference/Particles/defines.h:44-45` — 4M is
     both default and max; the shipped shader is the O(N) central well,
     `nBodyGravityCS.hlsl:85-109`) + 720p render, split-mode frame loop.
     Baseline: the same 60 FPS budget. vs_baseline = 16.67/value.
  6. (round 4+) render-only ms at 4M, 1024x1024 — the draw half of the
     reference default alone. Baseline: 159.8 ms = this repo's round-3
     measured anchor (regression gate). vs_baseline = 159.8/value.
  7. (round 5+) fused-mode frame at the reference-default 4M — the
     async-compute analog at the shipped N (`Particles.cpp:202-207`
     offers both modes at any N). Affordable now that the persistent
     compilation cache (utils/compilecache.py) makes the ~7-min fused-4M
     compile a one-time cost per toolchain. vs_baseline = 16.67/value.
  8. (round 5+) 16.8M end-to-end frame (pm_grid G=128 + 1024x1024
     chunked render — 4x the reference's maximum N on one chip).
     Baseline: 852.8 ms = this repo's round-3 measured frame
     (docs/demo_pm_16m_metrics.json). vs_baseline = 852.8/value.

Timing notes (see .claude/skills/verify/SKILL.md): on the axon tunnel,
`block_until_ready` does not reliably block for Pallas outputs, so every
measurement forces a 1-element host round-trip (`utils.timers.sync`);
sim steps are chained (state -> state) so nothing can be skipped.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_PAIRS_PER_SEC = 1.0e12
FRAME_BUDGET_MS = 1000.0 / 60.0        # README.md:12 60 FPS win condition
RENDER_R1_MS = 35.9                    # round-1 measured 262K @1024^2
RENDER_4M_R3_MS = 159.8                # round-3 measured 4M @1024^2 anchor
PM_R1_MS = 553.0                       # round-1 measured 4M @G=128
FRAME_16M_R3_MS = 852.8                # round-3 16.8M frame (PM+render)
EXACT_262K_MS = 371.0                  # Pallas all-pairs on the 262K demo
#                                        scene (the reference's only exact
#                                        mode) — tree-P3M's bar to beat
EXACT_1M_MS = 5719.0                   # same bar at 1M (README table)

N_KERNEL = 1_048_576
N_FRAME = 262_144
N_PM = 4_194_304


def _bench_kernel(jax, n: int) -> dict:
    from multi_adapter_particles_tpu.config import SimConfig
    from multi_adapter_particles_tpu.models import init as pinit, integrator
    from multi_adapter_particles_tpu.ops import allpairs
    from multi_adapter_particles_tpu.ops.dispatch import pallas_supported
    from multi_adapter_particles_tpu.utils.timers import sync

    # Headline = the PRODUCTION DEFAULT all-pairs kernel: the Newton-3rd
    # half-pair schedule (single-chip default since round 5 —
    # SimConfig.all_pairs_half, A/B evidence in BASELINE.md;
    # ops/allpairs.all_pairs_accel_halfpair). The rectangle kernel (the
    # bit-stable multi-chip building block, -rectpair) is timed too and
    # reported alongside.
    rates = {}
    for label, half in (("halfpair", True), ("rect", False)):
        cfg = SimConfig(num_particles=n, force_model="all_pairs",
                        all_pairs_half=half)
        accel_fn = (
            allpairs.make_accel_fn(
                mass=cfg.mass,
                softening_squared=cfg.softening_squared,
                interaction_scale=cfg.interaction_scale,
                half=half,
            )
            if pallas_supported()
            else None
        )
        step = integrator.make_step(cfg, accel_fn=accel_fn, donate=True)

        state = pinit.initialize_particles_device(n, seed=42)
        np_pad = state.padded_count

        state = step(state)  # warm-up/compile
        sync(state.position)

        timed_steps = 3
        t0 = time.perf_counter()
        for _ in range(timed_steps):
            state = step(state)
        sync(state.position)
        dt = time.perf_counter() - t0
        rates[label] = float(timed_steps) * np_pad * np_pad / dt

    pairs_per_sec = max(rates.values())
    best = max(rates, key=rates.get)
    return {
        "metric": f"pairwise interactions/sec/chip @ {n} particles "
        f"(all-pairs softened gravity, fp32, {best} kernel)",
        "value": pairs_per_sec,
        "unit": "pairs/s",
        "vs_baseline": pairs_per_sec / BASELINE_PAIRS_PER_SEC,
        "kernels": {k: v for k, v in rates.items()},
    }


def _bench_frame(jax, n: int, warm: int, timed: int,
                 sim_kw: dict | None = None,
                 width: int = 1280, height: int = 720,
                 baseline_ms: float = FRAME_BUDGET_MS,
                 tag: str = "") -> dict:
    """Full split-mode frame loop (default: 720p central-well —
    BASELINE.json config #3; `sim_kw`/`width`/`height` parameterize the
    16.8M pm_grid stage)."""
    from multi_adapter_particles_tpu.config import (
        AppConfig, RenderConfig, SimConfig,
    )
    from multi_adapter_particles_tpu.runtime.orchestrator import ParticlesApp
    from multi_adapter_particles_tpu.utils.timers import sync

    app = ParticlesApp(
        AppConfig(num_particles=n, vsync=False, gui=False),
        SimConfig(num_particles=n, **(sim_kw or {})),
        RenderConfig(width=width, height=height),
        seed=42,
        async_timers=False,
    )

    def drain():
        app.compute.wait_for_gpu()
        if app.render.last_frame is not None:
            sync(app.render.last_frame)

    for _ in range(warm):
        app.draw()
    drain()
    t0 = time.perf_counter()
    for _ in range(timed):
        app.draw()
    drain()
    ms = (time.perf_counter() - t0) * 1000.0 / timed
    app.shutdown()
    return {
        "metric": f"split-mode frame ms @ {n} particles, {width}x{height} "
        f"(sim+render, dispatch-ahead{tag})",
        "value": ms,
        "unit": "ms/frame",
        "vs_baseline": baseline_ms / ms,
    }


def _bench_render(jax, n: int, warm: int, timed: int,
                  baseline_ms: float = RENDER_R1_MS) -> dict:
    """Render-only @1024^2 (regression gate: round 1's 35.9 ms at 262K,
    round 3's 159.8 ms anchor at the reference-default 4M)."""
    from multi_adapter_particles_tpu.config import RenderConfig
    from multi_adapter_particles_tpu.models import init as pinit
    from multi_adapter_particles_tpu.render.camera import Camera
    from multi_adapter_particles_tpu.render.renderer import Renderer
    from multi_adapter_particles_tpu.utils.timers import sync

    cfg = RenderConfig(width=1024, height=1024)
    renderer = Renderer(cfg)
    camera = Camera(position=cfg.camera_position)
    state = pinit.initialize_particles_device(n, seed=42)
    sync(state.position)

    out = None
    for _ in range(warm):
        out = renderer.render_arrays(state.position, camera, 2.5, 0.15)
    sync(out.frame)
    t0 = time.perf_counter()
    for _ in range(timed):
        out = renderer.render_arrays(state.position, camera, 2.5, 0.15)
    sync(out.frame)
    ms = (time.perf_counter() - t0) * 1000.0 / timed
    return {
        "metric": f"render-only ms @ {n} particles, 1024x1024 exact splat",
        "value": ms,
        "unit": "ms/frame",
        "vs_baseline": baseline_ms / ms,
    }


def _bench_fused(jax, n: int, warm: int, timed: int) -> dict:
    """Fused single-program frame @720p (the async-compute analog,
    `/root/reference/Particles/Compute.cpp:956-987`). Driver-recorded so a
    fused regression is visible every round (VERDICT r2 #5/#3)."""
    from multi_adapter_particles_tpu.config import (
        AppConfig, RenderConfig, SimConfig,
    )
    from multi_adapter_particles_tpu.runtime.orchestrator import ParticlesApp
    from multi_adapter_particles_tpu.utils.timers import sync

    app = ParticlesApp(
        AppConfig(num_particles=n, vsync=False, gui=False),
        SimConfig(num_particles=n),
        RenderConfig(width=1280, height=720),
        seed=42,
        fused=True,
        async_timers=False,
    )

    def drain():
        app.compute.wait_for_gpu()
        if app.render.last_frame is not None:
            sync(app.render.last_frame)

    for _ in range(warm):
        app.draw()
    drain()
    t0 = time.perf_counter()
    for _ in range(timed):
        app.draw()
    drain()
    ms = (time.perf_counter() - t0) * 1000.0 / timed
    app.shutdown()
    return {
        "metric": f"fused-mode frame ms @ {n} particles, 1280x720 "
        "(single-program sim+render)",
        "value": ms,
        "unit": "ms/frame",
        "vs_baseline": FRAME_BUDGET_MS / ms,
    }


def _bench_pm(jax, n: int, grid: int, steps: int) -> dict:
    """pm_grid 4M G=128 step (regression gate vs round 1's 553 ms)."""
    from multi_adapter_particles_tpu.config import SimConfig
    from multi_adapter_particles_tpu.models import init as pinit, integrator
    from multi_adapter_particles_tpu.utils.timers import sync

    cfg = SimConfig(
        num_particles=n, force_model="pm_grid", pm_grid_size=grid,
        interaction_scale=1.0 / n,
    )
    step = integrator.make_step(cfg, donate=True)
    state = pinit.initialize_particles_device(n, seed=42)
    state = step(state)
    sync(state.position)
    t0 = time.perf_counter()
    for _ in range(steps):
        state = step(state)
    sync(state.position)
    ms = (time.perf_counter() - t0) * 1000.0 / steps
    return {
        "metric": f"pm_grid self-gravity step ms @ {n} particles, G={grid}",
        "value": ms,
        "unit": "ms/step",
        "vs_baseline": PM_R1_MS / ms,
    }


def _bench_tree(jax, n: int, grid: int, reps: int,
                exact_ms: float = EXACT_262K_MS) -> dict:
    """Tree-P3M exactness mode on the demo init (VERDICT r2 #2): <1% RMS
    on ANY scene at a fraction of the exact all-pairs cost. Baseline:
    the optimized Pallas all-pairs kernel on the same scene — 371 ms
    @262K, 5719 ms @1M (vs_baseline >1 = cheaper than the reference's
    only exact mode)."""
    import numpy as np

    from multi_adapter_particles_tpu.models import init as pinit
    from multi_adapter_particles_tpu.ops import p3m
    from multi_adapter_particles_tpu.ops.treeforce import host_pair_budget
    from multi_adapter_particles_tpu.utils.timers import sync

    box = 2048.0
    state = pinit.initialize_particles_device(n, seed=42)
    sync(state.position)
    pos = state.position
    r_c = 6.75 * box / grid
    gn = max(int(box // r_c), 1)
    budget = host_pair_budget(np.asarray(pos), box, r_c, gn)

    def accel():
        # half_force mirrors the SimConfig production default (round 5:
        # the Newton-3rd halved sweep where its static gate admits it —
        # 262K runs halved, 1M falls back to the directed sweep bitwise)
        acc, dropped = p3m.p3m_accel_with_overflow(
            pos, grid=grid, box=box, g_const=70000.0,
            softening_squared=25.0, near_mode="tree", pair_budget=budget,
            half_force=True,
        )
        return acc, dropped

    acc, dropped = accel()
    sync(acc)
    t0 = time.perf_counter()
    for _ in range(reps):
        acc, dropped = accel()
    sync(acc)
    ms = (time.perf_counter() - t0) * 1000.0 / reps
    return {
        "metric": f"tree-P3M accel ms @ {n} particles (demo scene), G={grid}",
        "value": ms,
        "unit": "ms/accel",
        "vs_baseline": exact_ms / ms,
        "dropped_pairs": int(dropped),
    }


def main() -> int:
    from multi_adapter_particles_tpu.utils import compilecache

    # warm launches fetch compiled programs instead of recompiling —
    # makes the fused-4m stage (a ~7-min cold compile) affordable
    compilecache.enable("auto")

    import jax

    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        n_kernel, n_frame, n_pm, g_pm = N_KERNEL, N_FRAME, N_PM, 128
        warm, timed = 5, 15
    else:
        # CI smoke fallback; the driver runs this on real TPU
        n_kernel, n_frame, n_pm, g_pm = 8192, 8192, 8192, 32
        warm, timed = 2, 3

    def note(msg):
        print(msg, file=sys.stderr, flush=True)

    note(f"bench: backend={jax.default_backend()}")
    t0 = time.perf_counter()
    try:
        headline = _bench_kernel(jax, n_kernel)
        note(f"bench: kernel done at +{time.perf_counter()-t0:.0f}s")
    except Exception as e:  # noqa: BLE001 — still emit the JSON line
        headline = {
            "metric": f"pairwise interactions/sec/chip @ {n_kernel} "
                      "particles (all-pairs Pallas kernel)",
            "value": 0.0,
            "unit": "pairs/s",
            "vs_baseline": 0.0,
            "error": f"{type(e).__name__}: {e}",
        }
        note(f"bench: kernel FAILED: {e}")

    # Each staged config is best-effort: a failure (OOM, tunnel hiccup)
    # must not cost the driver the headline metric or the other stages.
    extra = []
    # pm and render before frame: the frame bench builds the whole app
    # (most compiles), so if a driver-side budget truncates the run the
    # cheaper regression gates land first
    # frame loops warm longer and time longer: the transport-aware pacing
    # bound ramps up over the first ~6-8 confirmation cycles
    # (runtime/pacing.py), and a short timed segment pays the remaining
    # ramp + pipeline-drain tail disproportionately
    # 30/60, not 12/30: the transport-aware pacing bound is still
    # ramping at frame ~20 on a 35 ms-RTT tunnel — the short window
    # measured 11.25 ms @262K where 30/60 and a 120-frame CLI run both
    # measure 7.3-7.5 (A/B 2026-08-19, /tmp/frame_window.log)
    warm_frames = 30 if on_tpu else warm
    timed_frames = 60 if on_tpu else timed
    for name, fn in (
        ("pm", lambda: _bench_pm(jax, n_pm, g_pm, 5 if on_tpu else 2)),
        ("tree", lambda: _bench_tree(
            jax, n_frame, 128 if on_tpu else 16, 5 if on_tpu else 2)),
        # the 1M scaling point: grid optimum shifts with N (ROADMAP) —
        # G=192 at 1M; baseline = the exact Pallas kernel on that scene
        ("tree-1m", lambda: _bench_tree(
            jax, n_kernel, 192 if on_tpu else 16, 3 if on_tpu else 2,
            exact_ms=EXACT_1M_MS)),
        ("render", lambda: _bench_render(
            jax, n_frame if on_tpu else 8192, warm, timed)),
        # 4/14 frames (~1.6 s of device time): a 6-frame window measured
        # 142.9/126.2/87.6 ms across three same-day runs (transient
        # tunnel stalls land whole-frame-sized spikes on short windows);
        # the longer window averages them out
        ("render-4m", lambda: _bench_render(
            jax, n_pm, 4 if on_tpu else warm, 14 if on_tpu else timed,
            baseline_ms=RENDER_4M_R3_MS)),
        ("frame", lambda: _bench_frame(
            jax, n_frame, warm_frames, timed_frames)),
        # the reference's shipped default config: 4M central-well + draw.
        # frames are ~10x 262K's, so fewer of them keeps the stage bounded
        # while still past the pacing ramp (~8 confirm cycles)
        ("frame-4m", lambda: _bench_frame(
            jax, n_pm, 30 if on_tpu else warm, 40 if on_tpu else timed)),
        ("fused", lambda: _bench_fused(
            jax, n_frame, warm_frames, timed_frames)),
        # round 5: the fused stage at the reference-default 4M is
        # affordable now — the persistent compilation cache makes its
        # ~7-min compile a once-per-toolchain cost (a warm run fetches).
        ("fused-4m", lambda: _bench_fused(
            jax, n_pm, 20 if on_tpu else warm, 30 if on_tpu else timed)),
        # 16.8M end-to-end (4x the reference's max N, one chip): pm_grid
        # G=128 + 1024^2 chunked render through the same frame loop
        ("frame-16m", lambda: _bench_frame(
            jax, 16_777_216 if on_tpu else 8192,
            3 if on_tpu else warm, 8 if on_tpu else timed,
            sim_kw={"force_model": "pm_grid",
                    "pm_grid_size": 128 if on_tpu else 16},
            width=1024, height=1024,
            baseline_ms=FRAME_16M_R3_MS,
            tag="; pm_grid self-gravity",
        )),
    ):
        try:
            extra.append(fn())
            note(f"bench: {name} done at +{time.perf_counter()-t0:.0f}s")
        except Exception as e:  # noqa: BLE001 — report, keep benching
            extra.append({"metric": name, "error": f"{type(e).__name__}: {e}"})
            note(f"bench: {name} FAILED: {e}")
    # fused vs split head-to-head AT THE SAME N: the async-compute
    # analog's claimed win, recorded by the driver every round
    # (>1 = fused faster)
    for e in extra:
        metric = e.get("metric", "")
        if "fused-mode frame" not in metric or "value" not in e:
            continue
        n_tag = metric.split("@", 1)[1].split("particles")[0].strip()
        split_ms = next(
            (s["value"] for s in extra
             if "split-mode frame" in s.get("metric", "")
             and f"@ {n_tag} particles" in s["metric"] and "value" in s),
            None,
        )
        if split_ms:
            e["vs_split"] = split_ms / e["value"]
    out = dict(headline)
    out["extra"] = extra
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
