"""Slab-decomposed distributed FFT convolution vs the local solve.

The distributed pipeline (psum_scatter -> local pruned FFTs -> all_to_all
transposes -> sharded kernel multiply -> inverse + all_gather) must
reproduce the single-device `ops/pm._convolve_pruned` result, and the
sharded PM step with `pm_distributed_fft=True` must match the
single-device trajectory.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from multi_adapter_particles_tpu.config import SimConfig
from multi_adapter_particles_tpu.models import init as pinit, integrator
from multi_adapter_particles_tpu.ops import pm
from multi_adapter_particles_tpu.parallel import (
    dist_fft, make_mesh, make_sharded_step, shard_state,
)
from multi_adapter_particles_tpu.parallel.mesh import (
    AXIS, make_multislice_mesh,
)


class TestSupports:
    def test_gating(self):
        assert dist_fft.supports(32, 4)
        assert dist_fft.supports(256, 8)
        assert not dist_fft.supports(32, 1)   # nothing to distribute
        assert not dist_fft.supports(48, 7)   # 48 % 7 != 0
        assert not dist_fft.supports(30, 4)   # 30 % 4 != 0


class TestConvolve:
    @pytest.mark.parametrize("ndev", [4, 8])
    def test_matches_local_convolve(self, ndev):
        devices = jax.devices()
        if len(devices) < ndev:
            pytest.skip(f"needs {ndev}+ devices")
        mesh = make_mesh(devices[:ndev])
        g, box, eps2 = 32, 2048.0, 25.0
        rng = np.random.default_rng(0)
        parts = rng.normal(size=(ndev, g, g, g)).astype(np.float32)
        kernel = dist_fft.make_kernel_slabs(mesh, g, box, eps2)

        def f(part, ker):
            return dist_fft.convolve_slab(part[0], ker, g)[None]

        out = jax.jit(
            jax.shard_map(
                f, mesh=mesh,
                in_specs=(P(AXIS), P(None, AXIS, None)),
                out_specs=P(AXIS),
            )
        )(jnp.asarray(parts), kernel)
        out = np.asarray(out)

        want = np.asarray(
            pm._convolve_pruned(
                jnp.asarray(parts.sum(axis=0)),
                pm._potential_kernel_rfft(g, box, eps2),
                g,
            )
        )
        scale = np.abs(want).max()
        for d in range(ndev):
            # every device must hold the SAME, correct full phi
            np.testing.assert_allclose(
                out[d], want, rtol=1e-4, atol=1e-4 * scale
            )


class TestShardedPMDistFFT:
    def _cfg(self, n):
        return SimConfig(
            num_particles=n, force_model="pm_grid",
            pm_grid_size=32, pm_box=4096.0, interaction_scale=1.0 / n,
            pm_distributed_fft=True,
        )

    def test_matches_single_device(self):
        devices = jax.devices()
        if len(devices) < 4:
            pytest.skip("needs 4+ devices")
        n = 1024
        cfg = self._cfg(n)
        ref = integrator.make_step(cfg, donate=False)(
            pinit.initialize_particles_device(n, seed=2)
        )
        mesh = make_mesh(devices[:4])
        sstate = shard_state(pinit.initialize_particles_device(n, seed=2), mesh)
        out = make_sharded_step(cfg, mesh, donate=False)(sstate)
        np.testing.assert_allclose(
            np.asarray(out.position), np.asarray(ref.position),
            rtol=1e-5, atol=1e-3,
        )

    def test_multislice(self):
        devices = jax.devices()
        if len(devices) < 8:
            pytest.skip("needs 8 devices")
        n = 1024
        cfg = self._cfg(n)
        ref = integrator.make_step(cfg, donate=False)(
            pinit.initialize_particles_device(n, seed=4)
        )
        mesh = make_multislice_mesh(2, devices)
        sstate = shard_state(pinit.initialize_particles_device(n, seed=4), mesh)
        out = make_sharded_step(cfg, mesh, donate=False)(sstate)
        np.testing.assert_allclose(
            np.asarray(out.position), np.asarray(ref.position),
            rtol=1e-5, atol=1e-3,
        )

    def test_multi_step_trajectory(self):
        devices = jax.devices()
        if len(devices) < 4:
            pytest.skip("needs 4+ devices")
        n = 1024
        cfg = self._cfg(n)
        s_ref = pinit.initialize_particles_device(n, seed=7)
        ref_step = integrator.make_step(cfg, donate=False)
        for _ in range(3):
            s_ref = ref_step(s_ref)
        mesh = make_mesh(devices[:4])
        s = shard_state(pinit.initialize_particles_device(n, seed=7), mesh)
        step = make_sharded_step(cfg, mesh, donate=False)
        for _ in range(3):
            s = step(s)
        np.testing.assert_allclose(
            np.asarray(s.position), np.asarray(s_ref.position),
            rtol=1e-4, atol=5e-3,
        )
