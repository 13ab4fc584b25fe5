"""Live elastic re-sharding demo: rebalance the compute role mid-run.

Runs a few frames single-device, rescales to an 8-device mesh, then down
to 2, verifying the trajectory never notices (the CopyState guarantee,
generalized). Run on CPU with virtual devices:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python examples/elastic_rescale.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

# honor JAX_PLATFORMS even where a site plugin overrides it (see conftest)
_want = os.environ.get("JAX_PLATFORMS")
if _want and jax.config.jax_platforms != _want:
    jax.config.update("jax_platforms", _want)

import numpy as np

from multi_adapter_particles_tpu.config import AppConfig, RenderConfig, SimConfig
from multi_adapter_particles_tpu.models import init as pinit, integrator
from multi_adapter_particles_tpu.runtime import ParticlesApp

N = 4096


def main():
    devices = jax.devices()
    print(f"devices: {len(devices)} x {devices[0].platform}")
    app = ParticlesApp(
        AppConfig(num_particles=N, gui=False, vsync=False),
        SimConfig(num_particles=N),
        RenderConfig(width=256, height=256),
        seed=0,
    )
    ref_step = integrator.make_step(SimConfig(num_particles=N), donate=False)
    ref = pinit.initialize_particles_device(N, seed=0)

    plan = [(3, None), (2, 8), (2, 2), (3, 1)]
    for frames, mesh in plan:
        if mesh is not None and len(devices) >= max(mesh, 2):
            app.set_mesh_devices(mesh)
            print(f"-> rescaled compute role to {mesh} device(s): "
                  f"{app.metrics.gauges['mode_banner']}")
        for _ in range(frames):
            app.draw()
            ref = ref_step(ref)
    app.compute.wait_for_gpu()
    err = np.abs(
        np.asarray(app.compute.positions) - np.asarray(ref.position)
    ).max()
    print(f"max divergence from uninterrupted run: {err:.2e}")
    assert err < 1e-3
    print("trajectory continuous across every rescale — OK")
    app.shutdown()


if __name__ == "__main__":
    main()
