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


def pick_tile(n: int, want: int, align: int) -> int:
    """Largest tile size <= `want` that divides `n` and is a multiple of
    `align` (sublane/lane tiling). Raises when impossible — a silent
    fallback would produce a zero-size Pallas grid and garbage output."""
    if n % align:
        raise ValueError(
            f"dimension {n} is not a multiple of the required tile "
            f"alignment {align} (pad the array or use the XLA fallback)"
        )
    t = min(want, n)
    t -= t % align
    while t >= align and n % t:
        t -= align
    if t < align:
        raise ValueError(f"no {align}-aligned tile divides {n}")
    return t
