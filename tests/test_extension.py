"""ExtensionHelper (the vendor perf-extension layer analog)."""

import jax
import numpy as np

from multi_adapter_particles_tpu.config import AppConfig, RenderConfig, SimConfig
from multi_adapter_particles_tpu.runtime import ComputeEngine, ParticlesApp
from multi_adapter_particles_tpu.utils.extension import ExtensionHelper

N = 512


def test_probe_and_describe():
    ext = ExtensionHelper()
    # probe must settle to a boolean without raising, whatever the backend
    assert ext.available() in (True, False)
    assert "extension" in ext.describe()


def test_disabled_passthrough():
    ext = ExtensionHelper(enabled=False)
    jitted = jax.jit(lambda x: x * 2)
    out_fn = ext.compile(jitted, np.ones((8, 128), np.float32))
    assert out_fn is jitted  # disabled: plain jit returned


def test_compile_result_matches_plain():
    ext = ExtensionHelper(enabled=True)
    jitted = jax.jit(lambda x: x * 2 + 1)
    x = np.arange(16, dtype=np.float32).reshape(2, 8)
    fn = ext.compile(jitted, x)
    np.testing.assert_array_equal(np.asarray(fn(x)), np.asarray(jitted(x)))


def test_engine_with_extension_matches_without():
    dev = jax.devices()[0]
    cfg = SimConfig(num_particles=N)
    ext = ExtensionHelper(dev, enabled=True)
    e1 = ComputeEngine(cfg, dev, seed=4, extension=ext, donate=False)
    e2 = ComputeEngine(cfg, dev, seed=4, donate=False)
    for _ in range(3):
        e1.simulate()
        e2.simulate()
    np.testing.assert_allclose(
        np.asarray(e1.positions), np.asarray(e2.positions),
        rtol=1e-6, atol=2e-5,
    )


def test_runtime_toggle_in_app():
    app = ParticlesApp(
        AppConfig(num_particles=N, particle_size=10.0),
        SimConfig(num_particles=N),
        RenderConfig(width=256, height=256),
    )
    app.draw()
    app.app.use_queue_extension = False  # GUI checkbox analog
    app.draw()  # toggle picked up post-present
    assert app.extension.enabled is False
    app.app.use_queue_extension = True
    app.draw()
    assert app.extension.enabled is True
    app.shutdown()
