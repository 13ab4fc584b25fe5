"""ctypes binding for the native particle initializer.

`initialize_particles` mirrors `models/oracle.py::initialize_particles`
(two counter-orbiting clusters, seeds `seed` and `seed+1`) and is
bit-identical to the oracle for variants 'scalar' and 'simd' when
`chunks=1`. Build the library with `make -C multi_adapter_particles_tpu/native`;
if it is absent, `available()` returns False and callers fall back to the
oracle.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Tuple

import numpy as np

from multi_adapter_particles_tpu import constants as C

_LIB_PATH = os.path.join(os.path.dirname(__file__), "libmap_native.so")
_ABI_VERSION = 1

_lib = None
_load_error: Optional[str] = None


def _load():
    global _lib, _load_error
    if _lib is not None or _load_error is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        _load_error = f"{_LIB_PATH} not built (make -C native)"
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.map_fastinit_abi_version.restype = ctypes.c_int
        if lib.map_fastinit_abi_version() != _ABI_VERSION:
            _load_error = "ABI version mismatch; rebuild native/"
            return None
        lib.map_load_particles.restype = ctypes.c_int
        lib.map_load_particles.argtypes = [
            ctypes.c_int64,
            ctypes.c_char_p,
            ctypes.c_uint32,
            ctypes.c_float,
            ctypes.c_float,
            ctypes.c_float,
            ctypes.c_float,
            ctypes.c_float,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
        ]
        _lib = lib
    except OSError as e:  # pragma: no cover
        _load_error = str(e)
    return _lib


def available() -> bool:
    return _load() is not None


def load_particles(
    num_particles: int,
    center: Tuple[float, float, float],
    initial_speed: float = C.INITIAL_PARTICLE_SPEED,
    spread: float = C.PARTICLE_SPREAD,
    variant: str = "scalar",
    seed: int = 0,
    chunks: int = 1,
) -> Tuple[np.ndarray, np.ndarray]:
    """One cluster -> (positions [N, 4], velocities [N, 3]) float32."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native fastinit unavailable: {_load_error}")
    pos = np.zeros((num_particles, 4), dtype=np.float32)
    vel = np.zeros((num_particles, 3), dtype=np.float32)
    rc = lib.map_load_particles(
        num_particles,
        variant.encode(),
        np.uint32(seed),
        np.float32(center[0]),
        np.float32(center[1]),
        np.float32(center[2]),
        np.float32(initial_speed),
        np.float32(spread),
        int(chunks),
        pos.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        vel.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if rc != 0:
        raise ValueError(f"native init failed (variant={variant!r}, rc={rc})")
    return pos, vel


def initialize_particles(
    num_particles: int,
    variant: str = "scalar",
    seed: int = 0,
    spread: float = C.PARTICLE_SPREAD,
    initial_speed: float = C.INITIAL_PARTICLE_SPEED,
    chunks: int = 1,
) -> Tuple[np.ndarray, np.ndarray]:
    """Two counter-clusters (`Compute.cpp:820-844` layout)."""
    half = num_particles // 2
    center_spread = spread * 0.75
    p0, v0 = load_particles(
        half, (center_spread, 0.0, 0.0), initial_speed, spread, variant,
        seed, chunks,
    )
    p1, v1 = load_particles(
        num_particles - half, (-center_spread, 0.0, 0.0), initial_speed,
        spread, variant, seed + 1, chunks,
    )
    return np.concatenate([p0, p1]), np.concatenate([v0, v1])
