"""Interactive control-surface parity (runtime/controls.py + HTTP panel).

Every widget of the reference panel (`Particles.cpp:339-394`) must be
live-drivable: adapter list boxes, ext/vsync/fullscreen checkboxes,
size/intensity sliders, the linked Rendered/Copied/Simulated sliders with
their link toggle — through keys, through apply_control, and through the
HTTP dashboard.
"""

import json
import urllib.request

import jax
import numpy as np
import pytest

from multi_adapter_particles_tpu.config import AppConfig, RenderConfig, SimConfig
from multi_adapter_particles_tpu.runtime import ParticlesApp
from multi_adapter_particles_tpu.runtime.controls import (
    apply_control,
    apply_key,
    control_specs,
)
from multi_adapter_particles_tpu.utils.dashboard import DashboardServer

N = 512
SMALL_RENDER = RenderConfig(width=256, height=256)


def make_app(**kw):
    return ParticlesApp(
        AppConfig(num_particles=N, particle_size=10.0, vsync=False),
        SimConfig(num_particles=N), SMALL_RENDER, **kw
    )


class TestApplyControl:
    def test_every_reference_widget_is_drivable(self):
        """One flip per widget of Particles.cpp:339-394."""
        app = make_app()
        apply_control(app, "size", 7.5)
        assert app.app.particle_size == 7.5
        apply_control(app, "intensity", 0.4)
        assert app.app.particle_intensity == pytest.approx(0.4)
        apply_control(app, "vsync", "on")
        assert app.app.vsync is True
        apply_control(app, "fullscreen", 1)
        assert app.app.fullscreen is True
        apply_control(app, "ext", "false")
        assert app.app.use_queue_extension is False
        apply_control(app, "linked", False)
        apply_control(app, "numdraw", 256)
        apply_control(app, "numcopy", 384)
        apply_control(app, "numsim", 128)
        assert app.app.resolved_counts() == (128, 384, 256)
        apply_control(app, "draw", 0)
        assert app.draw_enabled is False
        if len(app.adapters) > 1:
            apply_control(app, "renderadapter", 1)
            assert app.render_adapter.index == 1
            apply_control(app, "computeadapter", 1)
            assert app.compute_adapter.index == 1
        app.shutdown()

    def test_slider_clamps(self):
        app = make_app()
        apply_control(app, "size", 99.0)
        assert app.app.particle_size == 10.0  # slider max (Particles.cpp:373)
        apply_control(app, "intensity", -3)
        assert app.app.particle_intensity == 0.0
        apply_control(app, "numdraw", 10 ** 9)
        assert app.app.resolved_counts()[2] == N
        app.shutdown()

    def test_linked_sliders_move_together(self):
        """Link ON: the three counts track the Rendered value
        (`Particles.cpp:388-392`)."""
        app = make_app()
        assert app.app.linked
        apply_control(app, "numdraw", 256)
        assert app.app.resolved_counts() == (256, 256, 256)
        # unlink, diverge, re-link snaps copied/simulated back to rendered
        apply_control(app, "linked", False)
        apply_control(app, "numsim", 128)
        assert app.app.resolved_counts() == (128, 256, 256)
        apply_control(app, "linked", True)
        assert app.app.resolved_counts() == (256, 256, 256)
        app.shutdown()

    def test_unknown_control_raises(self):
        app = make_app()
        with pytest.raises(KeyError):
            apply_control(app, "warp", 9)
        app.shutdown()

    def test_changes_take_effect_in_frames(self):
        """A control change visibly alters the next frame (end-to-end)."""
        app = make_app()
        app.draw()
        apply_control(app, "intensity", 0.0)
        app.draw()
        app.render.wait_for_gpu()
        assert np.asarray(app.render.last_frame).max() == 0.0
        apply_control(app, "intensity", 0.5)
        app.draw()
        app.render.wait_for_gpu()
        assert np.asarray(app.render.last_frame).max() > 0.0
        app.shutdown()

    def test_ext_toggle_reaches_reconfiguration(self):
        app = make_app()
        app.draw()
        before = app.compute.extension.enabled
        apply_control(app, "ext", not before)
        app.draw()  # change detection runs post-present
        assert app.compute.extension.enabled == (not before)
        app.shutdown()


class TestApplyKey:
    def test_key_map_covers_the_panel(self):
        app = make_app()
        apply_key(app, "[")
        assert app.app.particle_size == 9.5
        apply_key(app, "]")
        assert app.app.particle_size == 10.0
        apply_key(app, "-")
        assert app.app.particle_intensity == pytest.approx(0.1)
        apply_key(app, "=")
        assert app.app.particle_intensity == pytest.approx(0.15)
        apply_key(app, "v")
        assert app.app.vsync is True
        apply_key(app, "e")
        assert app.app.use_queue_extension is False
        apply_key(app, "f")
        assert app.app.fullscreen is True
        apply_key(app, "l")
        assert app.app.linked is False
        apply_key(app, "l")
        assert app.app.linked is True
        # count keys unlink and step
        apply_key(app, "1")
        assert app.app.linked is False
        assert app.app.resolved_counts()[0] == N - 128
        apply_key(app, "2")
        assert app.app.resolved_counts()[0] == N
        apply_key(app, "5")
        assert app.app.resolved_counts()[2] == N - 128
        assert apply_key(app, "w") is None  # camera keys pass through
        app.shutdown()

    def test_adapter_cycle_keys(self):
        if len(jax.devices()) < 2:
            pytest.skip("needs 2+ devices")
        app = make_app(compute_adapter=0, render_adapter=0)
        apply_key(app, "c")
        apply_key(app, "r")
        app.draw()  # reconfiguration applies post-present
        app.draw()
        assert app.compute_adapter.index == 1
        assert app.render_adapter.index == 1
        app.shutdown()

    def test_terminal_input_forwards_control_keys(self):
        from multi_adapter_particles_tpu.runtime.input import TerminalInput

        ti = TerminalInput()
        st = ti.feed("[]-=vefl123456")
        for k in "[]-=vefl123456":
            assert k in st.pressed


class TestDashboardServer:
    def test_http_round_trip(self):
        app = make_app()
        app.draw()
        srv = DashboardServer(app, port=0)
        try:
            base = f"http://127.0.0.1:{srv.port}"
            index = urllib.request.urlopen(f"{base}/", timeout=10).read()
            assert b"controls" in index and b"size" in index
            state = json.loads(
                urllib.request.urlopen(f"{base}/state", timeout=10).read()
            )
            assert any(c["name"] == "intensity" for c in state["controls"])
            png = urllib.request.urlopen(f"{base}/frame.png", timeout=10).read()
            assert png[:8] == b"\x89PNG\r\n\x1a\n"
            # widget change -> queued -> applied on the main thread
            r = urllib.request.urlopen(
                f"{base}/set?name=size&value=3.25", timeout=10
            ).read()
            assert r == b"ok"
            urllib.request.urlopen(
                f"{base}/set?name=vsync&value=1", timeout=10
            ).read()
            assert app.app.particle_size == 10.0  # not yet applied
            assert srv.drain() == 2
            assert app.app.particle_size == 3.25
            assert app.app.vsync is True
            # bad control is reported, not raised
            urllib.request.urlopen(
                f"{base}/set?name=warp&value=9", timeout=10
            ).read()
            srv.drain()
            assert any("error" in m for m in srv.messages)
        finally:
            srv.close()
            app.shutdown()

    def test_cli_serve_flag(self, tmp_path):
        from multi_adapter_particles_tpu.app import main

        rc = main([
            "-numparticles", "1024", "-steps", "2", "-novsync", "-nogui",
            "-width", "256", "-height", "256", "-serve", "0",
        ])
        assert rc == 0

    def test_specs_reflect_state(self):
        app = make_app()
        apply_control(app, "size", 4.0)
        specs = {s["name"]: s for s in control_specs(app)}
        assert specs["size"]["value"] == 4.0
        assert specs["renderadapter"]["kind"] == "select"
        assert len(specs["renderadapter"]["options"]) == len(app.adapters)
        app.shutdown()
