"""Device initializer tests: geometry invariants + statistical match to the
host oracle (the RNGs differ, so the comparison is distributional)."""

import numpy as np

from multi_adapter_particles_tpu import constants as C
from multi_adapter_particles_tpu.models import init as pinit
from multi_adapter_particles_tpu.models.state import padded_count


class TestDeviceInit:
    def test_shapes_and_padding(self):
        n = 300
        st = pinit.initialize_particles_device(n, seed=0)
        assert st.position.shape == (4, padded_count(n))
        assert st.velocity.shape == (3, padded_count(n))
        pos = np.asarray(st.position)
        assert np.all(np.abs(pos[:3, n:]) > 1e8)  # padding parked
        assert np.all(pos[3, :] == 0.0)  # w starts 0

    def test_on_sphere(self):
        n = 1024
        st = pinit.initialize_particles_device(n, seed=1)
        pos = np.asarray(st.position)[:3, :n].T
        half = n // 2
        c0 = np.array([C.CLUSTER_CENTER_X, 0, 0], dtype=np.float32)
        r0 = np.linalg.norm(pos[:half] - c0, axis=1)
        r1 = np.linalg.norm(pos[half:] + c0, axis=1)
        np.testing.assert_allclose(r0, C.PARTICLE_SPREAD, rtol=1e-4)
        np.testing.assert_allclose(r1, C.PARTICLE_SPREAD, rtol=1e-4)

    def test_velocity_rule(self):
        n = 256
        st = pinit.initialize_particles_device(n, seed=2)
        pos = np.asarray(st.position)[:3, :n].T.astype(np.float64)
        vel = np.asarray(st.velocity)[:, :n].T.astype(np.float64)
        d = pos / np.linalg.norm(pos, axis=1, keepdims=True)
        perp = np.array([1.0, 1.0, 1.0]) - d
        perp /= np.linalg.norm(perp, axis=1, keepdims=True)
        expect = np.cross(d, perp) * C.INITIAL_PARTICLE_SPEED
        np.testing.assert_allclose(vel, expect, rtol=1e-3, atol=1e-3)

    def test_deterministic_per_seed(self):
        a = pinit.initialize_particles_device(128, seed=5)
        b = pinit.initialize_particles_device(128, seed=5)
        c = pinit.initialize_particles_device(128, seed=6)
        np.testing.assert_array_equal(np.asarray(a.position), np.asarray(b.position))
        assert not np.array_equal(np.asarray(a.position), np.asarray(c.position))

    def test_distribution_matches_oracle(self):
        """Direction distribution (rejection-accumulated random walk) should
        statistically match the host oracle's."""
        n = 4096
        st = pinit.initialize_particles_device(n, seed=3)
        dev = np.asarray(st.position)[:3, : n // 2].T - np.array(
            [C.CLUSTER_CENTER_X, 0, 0]
        )
        host_pos, _ = pinit.initialize_particles_host(
            n, variant="scalar", seed=3
        ).to_aos(n)
        host = host_pos[: n // 2, :3] - np.array([C.CLUSTER_CENTER_X, 0, 0])
        # compare mean direction cosines per axis — both ~uniform on sphere
        for axis in range(3):
            dm = (dev[:, axis] / C.PARTICLE_SPREAD).mean()
            hm = (host[:, axis] / C.PARTICLE_SPREAD).mean()
            assert abs(dm) < 0.05 and abs(hm) < 0.05

    def test_host_init_roundtrip(self):
        n = 200
        st = pinit.initialize_particles_host(
            n, variant="scalar", seed=4, use_native=False
        )
        pos, vel = st.to_aos(n)
        from multi_adapter_particles_tpu.models import oracle

        opos, ovel = oracle.initialize_particles(n, variant="scalar", seed=4)
        np.testing.assert_array_equal(pos, opos)
        np.testing.assert_array_equal(vel, ovel)
