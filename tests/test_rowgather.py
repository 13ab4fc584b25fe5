"""Lane-packed row gather == plain gather, bitwise, at every geometry."""

import jax.numpy as jnp
import numpy as np
import pytest

from multi_adapter_particles_tpu.ops.rowgather import gather_rows


class TestGatherRows:
    @pytest.mark.parametrize("w", [1, 2, 4, 8, 16, 32, 64])
    def test_bitwise_matches_plain(self, w):
        rng = np.random.default_rng(w)
        r, n = 1000, 4096  # r deliberately NOT a multiple of 128//w
        table = rng.normal(size=(r, w)).astype(np.float32)
        idx = rng.integers(0, r, size=n).astype(np.int32)
        got = np.asarray(gather_rows(jnp.asarray(table), jnp.asarray(idx)))
        np.testing.assert_array_equal(got, table[idx])

    def test_wide_rows_fall_back(self):
        rng = np.random.default_rng(0)
        table = rng.normal(size=(64, 128)).astype(np.float32)
        idx = rng.integers(0, 64, size=256).astype(np.int32)
        got = np.asarray(gather_rows(jnp.asarray(table), jnp.asarray(idx)))
        np.testing.assert_array_equal(got, table[idx])

    def test_non_divisor_width_falls_back(self):
        rng = np.random.default_rng(1)
        table = rng.normal(size=(64, 3)).astype(np.float32)  # 128 % 3 != 0
        idx = rng.integers(0, 64, size=256).astype(np.int32)
        got = np.asarray(gather_rows(jnp.asarray(table), jnp.asarray(idx)))
        np.testing.assert_array_equal(got, table[idx])

    @pytest.mark.parametrize("w", [4, 32])
    def test_prepacked_table_bitwise(self, w):
        """A pre-packed [R/P, 128] table (packed_w=w) gathers bitwise
        identically to packing a plain [R, w] table internally."""
        rng = np.random.default_rng(10 + w)
        p = 128 // w
        r, n = 96 * p, 2048
        table = rng.normal(size=(r, w)).astype(np.float32)
        idx = rng.integers(0, r, size=n).astype(np.int32)
        packed = jnp.asarray(table.reshape(r // p, p * w))
        got = np.asarray(gather_rows(packed, jnp.asarray(idx), packed_w=w))
        np.testing.assert_array_equal(got, table[idx])

    def test_prepacked_width_mismatch_raises(self):
        with pytest.raises(ValueError, match="packed table width"):
            gather_rows(
                jnp.zeros((4, 64), jnp.float32),
                jnp.zeros(4, jnp.int32),
                packed_w=32,
            )

    def test_nonfinite_neighbors_do_not_poison(self):
        """Rows sharing a 128-lane line with Inf/NaN rows stay exact —
        the select chain never multiplies unselected payloads."""
        table = np.zeros((8, 32), np.float32)
        table[1] = np.inf
        table[2] = np.nan
        table[3] = 7.0
        idx = np.asarray([0, 3, 3, 0], np.int32)
        got = np.asarray(gather_rows(jnp.asarray(table), jnp.asarray(idx)))
        np.testing.assert_array_equal(got, table[idx])
        assert np.isfinite(got).all()
