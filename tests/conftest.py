"""Test configuration: force an 8-device virtual CPU mesh.

This is the TPU analog of a fake backend: multi-chip sharding tests run on
`--xla_force_host_platform_device_count=8` host devices (the reference has no
equivalent — it filters software adapters out, `Particles.cpp:108` — so this
is one of the places the new framework exceeds it).

Must run before jax is imported anywhere.

`MAP_TEST_BACKEND=tpu` opts OUT of the CPU forcing: the suite then runs on
the real default backend, which auto-enables the perf smoke tests
(test_perf_smoke.py keys on the live backend, not an env flag).
"""

import os

_want_tpu = os.environ.get("MAP_TEST_BACKEND", "").lower() == "tpu"

if not _want_tpu:
    os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon sitecustomize force-registers the TPU plugin and overwrites
# jax_platforms ("axon,cpu"), ignoring the env var — override it back
# before any backend initialization.
import jax  # noqa: E402

if not _want_tpu:
    jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _hermetic_probe_cache(tmp_path, monkeypatch):
    """Keep the startup-probe sidecar (utils/probecache.py) out of the
    real ~/.cache: tests get a per-test XDG_CACHE_HOME so app runs can't
    read stale probes or leave litter behind."""
    monkeypatch.setenv("XDG_CACHE_HOME", str(tmp_path / "xdg-cache"))


@pytest.fixture(scope="session")
def eight_devices():
    import jax

    devices = jax.devices()
    if len(devices) < 8:
        pytest.skip("needs 8 virtual devices")
    return devices[:8]
