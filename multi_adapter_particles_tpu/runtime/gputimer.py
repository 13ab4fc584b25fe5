"""Per-stage device timing from windowed XLA profiler traces.

The reference's `D3D12GpuTimer` (`include/D3D12GpuTimer.h:117-160`) writes
timestamp-query pairs around each stage on the GPU queue and resolves them
to a readback buffer — per-stage times from the DEVICE clock, with zero
pipeline stalls. The TPU-native equivalent of the device clock is the XLA
profiler: its device plane records the exact on-device start/duration of
every executed module (`jit_step`, `jit__render`, ...), so per-stage time
falls out of a short trace window without ever synchronizing the host.

Marker-based host observation cannot do this job here: completion
visibility over a tunneled transport is quantized to whole dispatch
batches (measured: stage markers resolve at frame granularity), and JAX
exposes no user-visible device timestamps. The profiler plane is the only
device-clock surface — and it is *better* than timestamp queries: every
module instance is timed, not just the two bracketing stamps.

Mechanics: every `window_every` frames the timer traces `window_frames`
frames into a temp dir, then parses the xplane in a background thread.
Tracing is NOT free even without host syncs: a 4-frame window measured
~160 ms of added wall time over the tunnel (+2.68 ms/frame amortized at
64-frame cadence, experiments/fused_marker_ab.py 2026-08-20), so the
default duty cycle is 2 frames every 128 (~0.6 ms/frame amortized) —
the readout still refreshes every ~2 s at 60 FPS with the EMA carrying
history, and `-timerwindow` tightens it when a run wants fresher rows.
Stage time per frame = sum of matching module durations / number of
executions (count-normalization makes window edges harmless — a module's
event is attributed whether or not the host dispatched it inside the
window). Results land on the usual "simulate ms" / "render ms"
`StageTimer` rows with the reference's EMA(1/20) smoothing
(`D3D12GpuTimer.h:133-160` GetTimes averaging).
"""

from __future__ import annotations

import glob
import os
import shutil
import tempfile
import threading
from typing import Dict, Optional, Sequence, Tuple

from multi_adapter_particles_tpu.utils.metrics import MetricsRegistry

# module-name substring -> stage row. The jitted callables are named by
# their Python function: integrator/sharded steps are `step`/`sharded_step`
# variants; the splatter's program is `_render`; the fused frame is `fused`.
DEFAULT_STAGE_PATTERNS: Dict[str, Tuple[str, ...]] = {
    "simulate": ("step",),
    "render": ("_render",),
    "frame": ("fused",),
}

# Fused-mode stage boundary (see runtime/fused.py stage_markers): the
# frame program broadcasts its render anchor to this sentinel column
# width, making the boundary op's OUTPUT SHAPE searchable in the op
# stream — the opt-barrier op itself generates no code and therefore no
# trace event on TPU. 61 never occurs as a natural lane width here
# (frame widths are multiples of 16, state rows are 3/4-wide).
STAGE_MARKER_COLS = 61
_MARKER_TOKENS = ("opt-barrier", f"f32[1,{STAGE_MARKER_COLS}]")


def parse_stage_ms(
    profile_data,
    stage_patterns: Dict[str, Tuple[str, ...]] = DEFAULT_STAGE_PATTERNS,
) -> Dict[str, float]:
    """Per-FRAME stage milliseconds from a ProfileData xspace.

    Walks every `XLA Modules` line of every device plane; for each stage,
    sums the durations of modules whose name contains any pattern. The
    per-frame normalizer is the execution count of a once-per-frame
    anchor stage (simulate, or the fused frame) when one is present —
    a stage may legitimately dispatch SEVERAL modules per frame (the
    chunked renderer issues one `_render` per chunk; dividing by its own
    count under-reported a 16.8M render 4x) — falling back to the
    stage's own count (render-only traces).

    Fused mode (the reference shows per-stage times in BOTH modes,
    `Particles.cpp:399-409`): the one `fused` module's op stream is
    split at the `opt-barrier` stage marker the frame program plants
    between its render and sim stages (`FusedEngine stage_markers`) —
    ops before the barrier are the render stage, ops after it the sim
    stage. Those land on the same "render"/"simulate" rows, per frame.
    """
    totals: Dict[str, float] = {}
    counts: Dict[str, int] = {}
    for plane in profile_data.planes:
        fused_spans = []  # (start_ns, end_ns) of each fused execution
        op_line = None
        for line in plane.lines:
            if line.name == "XLA Ops":
                # defer materializing: split-mode traces (no fused span)
                # never need the op stream, and a 16.8M chunked-render
                # window carries a very large one
                op_line = line
                continue
            if line.name != "XLA Modules":
                continue
            for event in line.events:
                name = event.name
                for stage, patterns in stage_patterns.items():
                    if any(p in name for p in patterns):
                        dur_ns = getattr(event, "duration_ns", None)
                        if dur_ns is None:
                            continue
                        totals[stage] = totals.get(stage, 0.0) + dur_ns
                        counts[stage] = counts.get(stage, 0) + 1
                        if stage == "frame":
                            fused_spans.append(
                                (event.start_ns, event.end_ns)
                            )
                        break
        if not fused_spans or op_line is None:
            continue
        # materialize now (one-shot iterator; the span loop below walks
        # it once per fused execution)
        op_events = [
            (
                getattr(ev, "start_ns", None),
                getattr(ev, "duration_ns", None),
                ev.name,
            )
            for ev in op_line.events
        ]
        # split each fused execution's op stream at its stage marker
        for span_start, span_end in fused_spans:
            barrier_ns = None
            ops = []
            for s, d, name in op_events:
                if s is None or d is None:
                    continue
                if s < span_start or s >= span_end:
                    continue
                if any(t in name for t in _MARKER_TOKENS):
                    if barrier_ns is None:
                        barrier_ns = s
                    continue  # the marker itself belongs to neither stage
                ops.append((s, d))
            if barrier_ns is None:
                continue  # markers off: module-level "frame" row only
            for s, d in ops:
                stage = "render" if s < barrier_ns else "simulate"
                totals[stage] = totals.get(stage, 0.0) + d
            # one render + one simulate sample per fused execution
            counts["render"] = counts.get("render", 0) + 1
            counts["simulate"] = counts.get("simulate", 0) + 1
    # frame count: prefer the module-level count ("frame" = one fused
    # execution each; in split mode it is absent and the per-module
    # "simulate" count is the frame count). NOT the marker-split sample
    # count — a window-edge-truncated marker drops a simulate/render
    # sample without dropping the module event, and dividing by the
    # smaller count would inflate the frame row's k-multiplier.
    frames = counts.get("frame") or counts.get("simulate")
    out: Dict[str, float] = {}
    for stage in totals:
        c = counts.get(stage)
        if not c:
            continue
        # per-frame dispatch multiplicity (1 for once-per-frame stages;
        # the chunk count for chunked renders); window edges round away
        k = max(1, round(c / frames)) if frames else 1
        out[stage] = (totals[stage] / c * k) / 1e6
    return out


class ProfilerStageTimer:
    """Windowed device-plane stage timing (the D3D12GpuTimer role)."""

    def __init__(
        self,
        metrics: Optional[MetricsRegistry] = None,
        stage_patterns: Optional[Dict[str, Tuple[str, ...]]] = None,
        window_every: int = 128,
        window_frames: int = 2,
        first_window: int = 8,
    ):
        """`first_window`: frame of the FIRST trace window. The reference
        times every frame (`D3D12GpuTimer.h:117-160`); an early first
        window (post-compile, default frame 8) makes short runs and demos
        record stage rows too — round 2's 64-frame-aligned duty cycle left
        any run under ~60 frames with empty stages_ms."""
        self.metrics = metrics or MetricsRegistry()
        self.stage_patterns = stage_patterns or dict(DEFAULT_STAGE_PATTERNS)
        self.window_every = max(int(window_every), int(window_frames) + 1)
        self.window_frames = max(1, int(window_frames))
        self._next_window = max(1, int(first_window))
        self._active_since: Optional[int] = None
        self._log_dir: Optional[str] = None
        self._parsers: list = []
        self._disabled = False
        self.windows_parsed = 0

    # -- frame hook (call once at the top of every frame) --------------------
    def on_frame(self, frame_count: int) -> None:
        if self._disabled:
            return
        if self._active_since is not None:
            if frame_count - self._active_since >= self.window_frames:
                self._stop_and_parse()
            return
        if frame_count >= self._next_window:
            self._next_window = frame_count + self.window_every
            self._start(frame_count)

    def _start(self, frame_count: int) -> None:
        import jax

        self._log_dir = tempfile.mkdtemp(prefix="map_tpu_gputimer_")
        try:
            try:
                # only the device planes matter: skip python/host tracing
                opts = jax.profiler.ProfileOptions()
                opts.python_tracer_level = 0
                opts.host_tracer_level = 0
                jax.profiler.start_trace(self._log_dir, profiler_options=opts)
            except TypeError:  # older start_trace signature
                jax.profiler.start_trace(self._log_dir)
        except Exception:
            # another trace is active (e.g. the CLI -trace flag) or the
            # backend can't profile: stand down for the whole run
            self._disabled = True
            shutil.rmtree(self._log_dir, ignore_errors=True)
            self._log_dir = None
            return
        self._active_since = frame_count

    def _stop_and_parse(self) -> None:
        import jax

        try:
            jax.profiler.stop_trace()
        except Exception:
            self._disabled = True
            return
        finally:
            self._active_since = None
        log_dir, self._log_dir = self._log_dir, None
        t = threading.Thread(
            target=self._parse, args=(log_dir,), daemon=True,
            name="gputimer-parse",
        )
        t.start()
        self._parsers.append(t)

    def _parse(self, log_dir: str) -> None:
        try:
            from jax.profiler import ProfileData

            paths = glob.glob(
                os.path.join(log_dir, "**", "*.xplane.pb"), recursive=True
            )
            if not paths:
                return
            stage_ms = parse_stage_ms(
                ProfileData.from_file(paths[0]), self.stage_patterns
            )
            for stage, ms in stage_ms.items():
                self.metrics.stage(stage).add_sample(ms / 1e3)
            if stage_ms:
                self.windows_parsed += 1
        finally:
            shutil.rmtree(log_dir, ignore_errors=True)

    def flush(self) -> None:
        """Finish any open window and wait for pending parses."""
        if self._active_since is not None:
            self._stop_and_parse()
        for t in self._parsers:
            t.join(timeout=30.0)
        self._parsers = [t for t in self._parsers if t.is_alive()]

    def close(self) -> None:
        self.flush()
