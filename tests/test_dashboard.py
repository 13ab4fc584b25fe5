"""Dashboard rendering (the imgui overlay analog)."""

import os

import numpy as np

from multi_adapter_particles_tpu.config import AppConfig, RenderConfig, SimConfig
from multi_adapter_particles_tpu.runtime import ParticlesApp
from multi_adapter_particles_tpu.utils import dashboard


def make_app():
    return ParticlesApp(
        AppConfig(num_particles=256, particle_size=10.0),
        SimConfig(num_particles=256),
        RenderConfig(width=128, height=64),
    )


def test_ansi_panel_contains_controls():
    app = make_app()
    app.draw()
    text = dashboard.render_ansi(app, clear=False)
    for token in (
        "Multi-Adapter Split",  # default role split with 2+ devices
        "size", "intensity", "simulated", "copied",
        "rendered", "linked", "vsync", "frameTime",
    ):
        assert token in text, token
    # the adapter role markers
    assert "[CR]" in text or "[C " in text


def test_html_with_frame(tmp_path):
    app = make_app()
    app.draw()
    app.render.present()
    p = str(tmp_path / "dash.html")
    dashboard.write_html(app, p, frame=np.asarray(app.render.last_frame))
    content = open(p).read()
    assert "data:image/png;base64," in content
    assert "frameTime" in content
    assert os.path.getsize(p) > 1000
