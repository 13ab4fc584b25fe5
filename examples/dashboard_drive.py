"""Drive the live dashboard programmatically, end to end.

The reference's demo window is an imgui panel drawn into the swap chain:
widgets write app members and the frame loop reacts
(`/root/reference/Particles/Particles.cpp:309-421`). This example stands a
browser-less client in for the user: it runs the frame loop, connects to
`DashboardServer` over HTTP, moves sliders/checkboxes via `/set`, watches
the changes land through `drain()` in `/state`, and pulls live frames off
the `/stream` multipart push — the full control round-trip with no human.

Run on CPU:

    JAX_PLATFORMS=cpu python examples/dashboard_drive.py
"""

import json
import os
import sys
import urllib.request

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

_want = os.environ.get("JAX_PLATFORMS")
if _want and jax.config.jax_platforms != _want:
    jax.config.update("jax_platforms", _want)

from multi_adapter_particles_tpu.config import AppConfig, RenderConfig, SimConfig
from multi_adapter_particles_tpu.runtime import ParticlesApp
from multi_adapter_particles_tpu.utils.dashboard import DashboardServer

N = 4096


def get(base, path):
    with urllib.request.urlopen(base + path, timeout=5) as r:
        return r.read()


def state(base):
    controls = json.loads(get(base, "/state"))["controls"]
    return {w["name"]: w["value"] for w in controls}


def pump(app, server, frames):
    """The app's frame loop: draw, apply queued widget writes, push."""
    for _ in range(frames):
        app.draw()
        server.drain()
        if app.render.last_frame is not None:
            server.publish_frame(app.render.last_frame)
    app.compute.wait_for_gpu()


def main():
    app = ParticlesApp(
        AppConfig(num_particles=N, gui=False, vsync=False),
        SimConfig(num_particles=N),
        RenderConfig(width=256, height=256),
        seed=0,
    )
    server = DashboardServer(app, port=0, stream_fps=1000.0)
    base = f"http://127.0.0.1:{server.port}"
    print(f"dashboard: {base}/")

    pump(app, server, 2)
    before = state(base)
    print(f"initial: size={before['size']} intensity={before['intensity']} "
          f"numdraw={before['numdraw']} vsync={before['vsync']}")

    # A user drags sliders and clicks a checkbox in the browser panel…
    for name, value in [("size", 7.5), ("intensity", 0.33),
                        ("numdraw", N // 2), ("vsync", "on")]:
        assert get(base, f"/set?name={name}&value={value}") == b"ok"
    # …queued thread-safely; nothing mutates until the frame loop drains.
    assert state(base)["size"] == before["size"]

    pump(app, server, 2)
    after = state(base)
    print(f"after drain: size={after['size']} intensity={after['intensity']} "
          f"numdraw={after['numdraw']} vsync={after['vsync']}")
    assert after["size"] == 7.5 and abs(after["intensity"] - 0.33) < 1e-6
    assert after["numdraw"] == N // 2 and after["vsync"] is True
    assert app.app.particle_size == 7.5  # the frame loop saw the writes

    # Click ON the streamed frame (imgui-in-the-window parity): aim at
    # the intensity slider's bar in the composited panel — the server
    # hit-tests the pixel against the panel geometry and queues the same
    # control write a /set would.
    from multi_adapter_particles_tpu.utils import overlay
    from multi_adapter_particles_tpu.utils.dashboard import render_ansi

    lines = render_ansi(app, clear=False).splitlines()
    li = next(i for i, l in enumerate(lines) if l.startswith("intensity"))
    b1 = lines[li].index("]")
    cx = overlay.TEXT_X + (b1 - 1) * overlay.CHAR_W + 2
    cy = overlay.TEXT_Y + li * overlay.LINE_H + 3
    act = json.loads(get(base, f"/click?x={cx}&y={cy}"))
    print(f"click on frame ({cx},{cy}) -> {act}")
    assert act["name"] == "intensity"
    pump(app, server, 2)
    assert abs(app.app.particle_intensity - float(act["value"])) < 1e-6

    # The demo-window analog: frames stream as multipart PNG parts.
    req = urllib.request.urlopen(base + "/stream", timeout=5)
    pump(app, server, 6)
    boundary, parts, buf = b"--mapframe", 0, b""
    while parts < 3:
        chunk = req.read1(65536)
        if not chunk:
            break
        buf += chunk
        parts = buf.count(b"\x89PNG")
    req.close()
    print(f"streamed {parts} PNG frames off /stream")
    assert parts >= 3 and boundary in buf

    server.close()
    app.shutdown()
    print("dashboard round-trip: sliders -> /set -> drain -> /state, "
          "frames -> /stream, clicks-on-frame -> /click — OK")


if __name__ == "__main__":
    main()
