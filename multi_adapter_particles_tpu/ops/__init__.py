"""Pallas TPU kernels: the device-side hot loops.

These are the HLSL analogs (`nBodyGravityCS.hlsl`, `ParticleDraw.hlsl`)
rebuilt as TPU kernels:

- `central_well.py`  — the shipped O(N) CSMain integrator, fused in one
  VMEM pass (position+velocity update and |accel| in a single kernel).
- `allpairs.py`      — the tiled O(N^2) bodyBodyInteraction force, particle
  tiles staged through VMEM (the groupshared-memory analog).
- `composite.py`     — the VMEM segmented-blend (splat composite) kernel;
  the tile-binned rasterizer that feeds it lives in `render/renderer.py`.

Every kernel has an XLA fallback (used on CPU test meshes and as a
correctness oracle); the Pallas path is selected on TPU backends.
"""

from multi_adapter_particles_tpu.ops.dispatch import (
    is_tpu_backend,
    pallas_supported,
)

__all__ = ["is_tpu_backend", "pallas_supported"]
