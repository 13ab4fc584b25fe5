"""Oracle sanity tests: the executable spec must itself obey the reference's
documented invariants (survey Appendix A)."""

import numpy as np
import pytest

from multi_adapter_particles_tpu import constants as C
from multi_adapter_particles_tpu.models import oracle


class TestRngTiers:
    def test_fast_rand_sequence(self):
        # First outputs of the LCG seed=0: state = 2531011 -> out 38
        r = oracle.FastRand(0)
        state = 0
        outs = []
        for _ in range(5):
            state = (214013 * state + 2531011) & 0xFFFFFFFF
            outs.append((state >> 16) & 0x7FFF)
        assert [r.next() for _ in range(5)] == outs

    def test_fast_rand_range(self):
        r = oracle.FastRand(1234)
        vals = [r.next() for _ in range(1000)]
        assert all(0 <= v <= 0x7FFF for v in vals)

    def test_rand_sse_lanes_independent(self):
        r = oracle.RandSse(7)
        a = r.next4()
        b = r.next4()
        assert a.shape == (4,)
        assert not np.array_equal(a, b)
        assert np.all((a >= 0) & (a <= 0x7FFF))

    def test_uniform_range(self):
        r = oracle.FastRand(3)
        vals = np.concatenate([r.uniform3() for _ in range(300)])
        assert vals.min() >= -1.0 and vals.max() <= 1.0


@pytest.mark.parametrize("variant", ["orig", "scalar", "simd"])
class TestLoadParticles:
    def test_cluster_geometry(self, variant):
        n = 200
        center = (C.CLUSTER_CENTER_X, 0.0, 0.0)
        pos, vel = oracle.load_particles(n, center, variant=variant, seed=5)
        assert pos.shape == (n, 4) and vel.shape == (n, 3)
        assert pos.dtype == np.float32 and vel.dtype == np.float32
        # every particle sits on the sphere of radius spread around center
        d = pos[:, :3] - np.asarray(center, dtype=np.float32)
        radii = np.linalg.norm(d, axis=1)
        np.testing.assert_allclose(radii, C.PARTICLE_SPREAD, rtol=1e-5)
        # pos.w starts 0 (Compute.cpp:825-829)
        assert np.all(pos[:, 3] == 0.0)

    def test_velocity_rule(self, variant):
        """vel = speed * cross(normalize(pos), normalize((1,1,1)-normalize(pos)))
        (Compute.cpp:702-708)."""
        n = 64
        pos, vel = oracle.load_particles(
            n, (-C.CLUSTER_CENTER_X, 0, 0), variant=variant, seed=11
        )
        for i in range(n):
            p = pos[i, :3].astype(np.float64)
            d = p / np.linalg.norm(p)
            perp = np.array([1.0, 1.0, 1.0]) - d
            perp /= np.linalg.norm(perp)
            expect = np.cross(d, perp) * C.INITIAL_PARTICLE_SPEED
            np.testing.assert_allclose(vel[i], expect, rtol=1e-4, atol=1e-4)
        # velocity is perpendicular to the radius direction
        dots = np.einsum("ij,ij->i", vel, pos[:, :3])
        mags = np.linalg.norm(vel, axis=1) * np.linalg.norm(pos[:, :3], axis=1)
        assert np.all(np.abs(dots / mags) < 1e-3)

    def test_deterministic(self, variant):
        a = oracle.load_particles(50, (300, 0, 0), variant=variant, seed=9)
        b = oracle.load_particles(50, (300, 0, 0), variant=variant, seed=9)
        np.testing.assert_array_equal(a[0], b[0])
        np.testing.assert_array_equal(a[1], b[1])


class TestTwoClusters:
    def test_layout(self):
        n = 128
        pos, vel = oracle.initialize_particles(n, variant="scalar", seed=0)
        assert pos.shape == (n, 4)
        # first half around +300, second half around -300 (Compute.cpp:832-844)
        assert np.all(np.abs(pos[: n // 2, 0] - 300.0) <= C.PARTICLE_SPREAD + 1)
        assert np.all(np.abs(pos[n // 2 :, 0] + 300.0) <= C.PARTICLE_SPREAD + 1)


class TestCentralWellStep:
    def test_manual_single_particle(self):
        # hand-computed: p=(100,0,0), v=0
        pos = np.array([[100.0, 0.0, 0.0, 0.0]], dtype=np.float32)
        vel = np.zeros((1, 3), dtype=np.float32)
        d2 = 100.0 * 100.0 + 25.0
        s = -70000.0 / d2**1.5
        ax = 100.0 * s
        vx = ax * 0.1
        px = 100.0 + vx * 0.1
        new_pos, new_vel = oracle.central_well_step(pos, vel)
        np.testing.assert_allclose(new_pos[0, 0], px, rtol=1e-5)
        np.testing.assert_allclose(new_vel[0, 0], vx, rtol=1e-5)
        # pos.w = |accel|
        np.testing.assert_allclose(new_pos[0, 3], abs(ax), rtol=1e-5)

    def test_damping_and_dt(self):
        pos = np.array([[50.0, -20.0, 10.0, 0.0]], dtype=np.float32)
        vel = np.array([[1.0, 2.0, 3.0]], dtype=np.float32)
        new_pos, new_vel = oracle.central_well_step(
            pos, vel, dt=0.5, damping=0.9, mass=1000.0, softening_squared=4.0
        )
        r = pos[0, :3].astype(np.float64)
        a = r * (-1000.0 / (np.dot(r, r) + 4.0) ** 1.5)
        v = (vel[0] + a * 0.5) * 0.9
        p = r + v * 0.5
        np.testing.assert_allclose(new_vel[0], v, rtol=1e-5)
        np.testing.assert_allclose(new_pos[0, :3], p, rtol=1e-5)

    def test_orbit_energy_bounded(self):
        """Particles on tangential orbits must not escape to infinity or
        collapse within a few hundred steps."""
        pos, vel = oracle.initialize_particles(64, variant="scalar", seed=2)
        for _ in range(200):
            pos, vel = oracle.central_well_step(pos, vel)
        radii = np.linalg.norm(pos[:, :3], axis=1)
        assert np.all(radii < 5000.0)
        assert np.all(np.isfinite(pos).all() and np.isfinite(vel).all())


class TestAllPairsStep:
    def test_two_body_symmetry(self):
        pos = np.array(
            [[10.0, 0, 0, 0], [-10.0, 0, 0, 0]], dtype=np.float32
        )
        vel = np.zeros((2, 3), dtype=np.float32)
        new_pos, new_vel = oracle.all_pairs_step(pos, vel, mass=100.0)
        # equal and opposite acceleration along x
        np.testing.assert_allclose(new_vel[0], -new_vel[1], atol=1e-6)
        assert new_vel[0, 0] < 0  # attracted toward the other body

    def test_self_interaction_is_zero(self):
        pos = np.array([[5.0, 5.0, 5.0, 0.0]], dtype=np.float32)
        vel = np.zeros((1, 3), dtype=np.float32)
        new_pos, new_vel = oracle.all_pairs_step(pos, vel)
        np.testing.assert_array_equal(new_vel, np.zeros((1, 3), dtype=np.float32))
        np.testing.assert_allclose(new_pos[0, :3], pos[0, :3])

    def test_interaction_scale(self):
        rng = np.random.default_rng(0)
        pos = rng.normal(size=(8, 4)).astype(np.float32) * 50
        pos[:, 3] = 0
        vel = np.zeros((8, 3), dtype=np.float32)
        _, v1 = oracle.all_pairs_step(pos, vel, interaction_scale=1.0)
        _, v2 = oracle.all_pairs_step(pos, vel, interaction_scale=2.0)
        np.testing.assert_allclose(v2, v1 * 2.0, rtol=1e-5)
