"""Native fastinit: bit-exactness vs the NumPy oracle + threading modes.

The scalar/simd LCG tiers must match `models/oracle.py` bit-for-bit at
chunks=1 (same stream, same float32 roundings — the -ffp-contract=off
contract). 'orig' is deterministic-only (different MT19937 usage).
"""

import time

import numpy as np
import pytest

from multi_adapter_particles_tpu.models import oracle

fastinit = pytest.importorskip(
    "multi_adapter_particles_tpu.native.fastinit"
)

pytestmark = pytest.mark.skipif(
    not fastinit.available(), reason="native library not built"
)

N = 512


@pytest.mark.parametrize("variant", ["scalar", "simd"])
def test_bit_exact_vs_oracle(variant):
    p_ref, v_ref = oracle.initialize_particles(N, variant=variant, seed=7)
    p_nat, v_nat = fastinit.initialize_particles(N, variant=variant, seed=7)
    np.testing.assert_array_equal(p_ref, p_nat)
    np.testing.assert_array_equal(v_ref, v_nat)


def test_orig_deterministic_and_on_shell():
    p1, v1 = fastinit.initialize_particles(N, variant="orig", seed=3)
    p2, _ = fastinit.initialize_particles(N, variant="orig", seed=3)
    np.testing.assert_array_equal(p1, p2)
    # every particle sits on a radius-400 shell around its cluster center
    half = N // 2
    for sl, cx in ((slice(0, half), 300.0), (slice(half, N), -300.0)):
        d = p1[sl, :3] - np.array([cx, 0, 0], dtype=np.float32)
        np.testing.assert_allclose(
            np.linalg.norm(d, axis=1), 400.0, rtol=1e-5
        )
    # vel = 15 * cross(unit dir, unit perp): magnitude <= 15, perpendicular
    # to the radial direction from the origin
    speeds = np.linalg.norm(v1, axis=1)
    assert np.all(speeds <= 15.0 + 1e-3)
    assert speeds.mean() > 5.0
    dirs = p1[:, :3] / np.linalg.norm(p1[:, :3], axis=1, keepdims=True)
    assert np.abs(np.sum(dirs * v1, axis=1)).max() < 1e-3


def test_parallel_chunks_deterministic():
    p1, v1 = fastinit.initialize_particles(N, variant="scalar", seed=1, chunks=4)
    p2, v2 = fastinit.initialize_particles(N, variant="scalar", seed=1, chunks=4)
    np.testing.assert_array_equal(p1, p2)
    np.testing.assert_array_equal(v1, v2)
    # chunked stream differs from the sequential one (different seeds/chunk)
    p3, _ = fastinit.initialize_particles(N, variant="scalar", seed=1, chunks=1)
    assert not np.array_equal(p1, p3)
    # but the distribution contract holds: shell radius 400
    half = N // 2
    d = p1[:half, :3] - np.array([300.0, 0, 0], dtype=np.float32)
    np.testing.assert_allclose(np.linalg.norm(d, axis=1), 400.0, rtol=1e-5)


def test_host_init_routes_to_native():
    from multi_adapter_particles_tpu.models import init as pinit

    st = pinit.initialize_particles_host(N, variant="scalar", seed=7)
    p_ref, v_ref = oracle.initialize_particles(N, variant="scalar", seed=7)
    pos, vel = st.to_aos(N)
    np.testing.assert_array_equal(pos, p_ref)
    np.testing.assert_array_equal(vel, v_ref)


def test_native_is_fast():
    # 128K particles in well under a second (the oracle would take minutes)
    t0 = time.perf_counter()
    fastinit.initialize_particles(131072, variant="simd", seed=0, chunks=8)
    assert time.perf_counter() - t0 < 2.0
