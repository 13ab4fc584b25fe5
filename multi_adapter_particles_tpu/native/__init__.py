"""Native (C++) components, loaded via ctypes.

Build with `make -C multi_adapter_particles_tpu/native`. Pure-Python
fallbacks exist for everything here; the native layer is the performance
tier (the reference's SSE/parallel_for lineage, `Compute.cpp:580-812`).
"""

from multi_adapter_particles_tpu.native import fastinit

__all__ = ["fastinit"]
