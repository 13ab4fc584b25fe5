"""VMEM bitonic sort (ops/sortkv.py) vs stable lax.sort — bit-exact.

The network must reproduce the stable sort EXACTLY (the renderer's draw
order depends on it); the idx operand makes every comparator strict, so
equality with `is_stable=True` is the contract, not an approximation.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multi_adapter_particles_tpu.ops.sortkv import sort_kv_stable


def ref_sort(key, *payloads):
    out = jax.lax.sort(
        (key, jax.lax.iota(jnp.int32, key.shape[0]), *payloads),
        dimension=0, num_keys=2, is_stable=True,
    )
    return (out[0], *out[2:])


@pytest.mark.parametrize("e_log,bl", [(9, 9), (10, 8), (12, 10), (13, 10)])
@pytest.mark.slow
def test_bit_exact_vs_stable_sort(e_log, bl):
    rng = np.random.default_rng(e_log)
    e = 1 << e_log
    # heavy duplicates: the stability contract is what's under test
    key = jnp.asarray(rng.integers(0, 37, e, dtype=np.int32))
    p1 = jnp.asarray(rng.random(e, dtype=np.float32))
    p2 = jnp.asarray(np.arange(e, dtype=np.float32))
    p3 = jnp.asarray(rng.random(e, dtype=np.float32))
    ref = ref_sort(key, p1, p2, p3)
    out = sort_kv_stable(key, p1, p2, p3, block_log2=bl)
    for a, b in zip(out, ref):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_all_equal_keys_is_identity():
    e = 1 << 10
    key = jnp.zeros((e,), jnp.int32)
    p = jnp.asarray(np.arange(e, dtype=np.float32))
    out = sort_kv_stable(key, p, block_log2=8)
    np.testing.assert_array_equal(np.asarray(out[1]), np.asarray(p))


def test_sentinel_padding_sorts_last():
    rng = np.random.default_rng(3)
    e = 1 << 10
    key = np.full(e, 2147483647, np.int32)
    key[: e // 2] = rng.integers(0, 100, e // 2)
    p = np.arange(e, dtype=np.float32)
    out = sort_kv_stable(jnp.asarray(key), jnp.asarray(p), block_log2=8)
    k = np.asarray(out[0])
    assert (k[e // 2:] == 2147483647).all()
    assert (np.diff(k) >= 0).all()


def test_non_pow2_rejected():
    with pytest.raises(ValueError, match="power of two"):
        sort_kv_stable(jnp.zeros((1000,), jnp.int32))
