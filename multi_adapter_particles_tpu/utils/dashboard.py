"""Terminal + HTML dashboard — the imgui control panel analog.

The reference's imgui overlay (`Particles.cpp:309-421`) shows: adapter list
boxes for both roles, a mode banner, UMA warning, extension/vsync/fullscreen
checkboxes, size/intensity sliders, linked Rendered/Copied/Simulated count
sliders, and live timers. Headless, the same surface is:

- `render_ansi(app)` — a live terminal panel (redrawn in place with ANSI
  cursor movement) showing every control's current value and the timers;
- `write_html(app, path)` — a self-contained HTML status page with the last
  rendered frame inlined as a base64 PNG (refreshed by the app every few
  frames; open it in a browser for the closest thing to the demo window).

Mutation happens through AppConfig / ParticlesApp setters (the CLI and any
driving script are the "widgets"); this module only *displays* state.
"""

from __future__ import annotations

import base64
import html

ANSI_HOME = "\x1b[H\x1b[2J"


def _slider(label: str, value: float, lo: float, hi: float, width: int = 24) -> str:
    t = 0.0 if hi <= lo else (value - lo) / (hi - lo)
    t = max(0.0, min(1.0, t))
    fill = int(t * width)
    return f"{label:<12} [{'#' * fill}{'-' * (width - fill)}] {value:g}"


def _checkbox(label: str, on: bool) -> str:
    return f"[{'x' if on else ' '}] {label}"


def render_ansi(app, clear: bool = True) -> str:
    """One frame of the terminal panel for a ParticlesApp."""
    from multi_adapter_particles_tpu import constants as C

    m = app.metrics
    lines = []
    if clear:
        lines.append(ANSI_HOME.rstrip("\n"))
    lines.append("== multi-adapter particles (TPU) " + "=" * 30)
    lines.append(str(m.gauges.get("mode_banner", "")))
    lines.append("")
    lines.append("Adapters (compute C / render R):")
    for a in app.adapters:
        roles = (
            ("C" if a.index == app.compute_adapter.index else " ")
            + ("R" if a.index == app.render_adapter.index else " ")
        )
        lines.append(f"  [{roles}] {a.index}: {a.platform:4s} {a.description}")
    lines.append("")
    cfg = app.app
    lines.append(_slider("size", cfg.particle_size, 0.0, 10.0))
    lines.append(_slider("intensity", cfg.particle_intensity, 0.0, 1.0))
    n = cfg.num_particles
    ns, nc, nd = cfg.resolved_counts()
    lines.append(_slider("simulated", ns, 0, n))
    lines.append(_slider("copied", nc, 0, n))
    lines.append(_slider("rendered", nd, 0, n))
    lines.append(
        "  ".join(
            [
                _checkbox("linked", cfg.linked),
                _checkbox("vsync", cfg.vsync),
                _checkbox("fullscreen", cfg.fullscreen),
                _checkbox("ext", cfg.use_queue_extension),
            ]
        )
    )
    lines.append("")
    for name, st in m.stages.items():
        lines.append(f"  {name} ms: {st.milliseconds:8.3f}")
    lines.append(f"  frameTime ms: {m.frame_ms:8.3f}  ({m.fps:6.1f} fps)")
    lines.append(f"  frames: {int(m.counters.get('frames', 0))}")
    if "transfer_bytes" in m.counters:
        lines.append(f"  transferred: {m.counters['transfer_bytes']/2**20:,.1f} MiB")
    return "\n".join(lines)


def write_html(app, path: str, frame=None) -> None:
    """Self-contained HTML status page (+ inlined frame PNG if given)."""
    img_tag = ""
    if frame is not None:
        import numpy as np

        from multi_adapter_particles_tpu.utils.png import write_png

        arr = np.asarray(frame)
        import tempfile, os

        with tempfile.NamedTemporaryFile(suffix=".png", delete=False) as f:
            tmp = f.name
        try:
            write_png(tmp, arr)
            data = base64.b64encode(open(tmp, "rb").read()).decode()
        finally:
            os.unlink(tmp)
        img_tag = (
            f'<img src="data:image/png;base64,{data}" '
            f'style="image-rendering:pixelated;max-width:100%">'
        )
    text = html.escape(render_ansi(app, clear=False))
    page = f"""<!doctype html><meta charset="utf-8">
<meta http-equiv="refresh" content="2">
<title>multi-adapter particles (TPU)</title>
<body style="background:#000;color:#ddd;font-family:monospace">
<pre>{text}</pre>{img_tag}</body>"""
    with open(path, "w") as f:
        f.write(page)
