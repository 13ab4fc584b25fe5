"""Backend dispatch helpers for Pallas kernels.

Pallas TPU kernels compile only on TPU backends; on the CPU test mesh the
kernels run through the Pallas interpreter (bit-compatible semantics, slow)
or fall back to the pure-XLA formulation. This module centralizes that
choice so every op in `ops/` dispatches the same way.
"""

from __future__ import annotations

import functools

import jax


@functools.lru_cache(maxsize=None)
def default_backend() -> str:
    return jax.default_backend()


def is_tpu_backend() -> bool:
    return default_backend() == "tpu"


def pallas_supported() -> bool:
    """True when pallas_call can compile natively (TPU)."""
    return is_tpu_backend()


def interpret_flag() -> bool:
    """`interpret=` value for pallas_call: interpret on non-TPU backends."""
    return not is_tpu_backend()
