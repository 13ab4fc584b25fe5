"""Renderer cost attribution on real TPU: sort vs gather vs composite scan.

Stages timed separately (each as its own jit so XLA can't fuse across the
boundary we're measuring):
  project+bin (keys)        — elementwise
  argsort (stable)          — the suspected hot spot at n*dup entries
  starts/counts+gather      — searchsorted + [T, k_max] param gathers
  composite scan            — k_max blend steps over all tiles

Also times the full render at several k_max values and window sizes.

Usage: python experiments/render_profile.py [N] [k_max]
"""

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from multi_adapter_particles_tpu.config import RenderConfig
from multi_adapter_particles_tpu.models import init as pinit
from multi_adapter_particles_tpu.render.camera import Camera
from multi_adapter_particles_tpu.render.renderer import Renderer


def sync(x):
    _ = float(jax.device_get(jnp.ravel(x)[0]))


def t(name, fn, *args, k=5):
    out = fn(*args)
    sync(out if not isinstance(out, tuple) else out[0])
    t0 = time.perf_counter()
    for _ in range(k):
        out = fn(*args)
    sync(out if not isinstance(out, tuple) else out[0])
    dt = (time.perf_counter() - t0) / k
    print(f"{name:28s}: {dt*1e3:9.2f} ms", flush=True)
    return out


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 262144
    k_max = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    dup = 6
    print(f"N={n} k_max={k_max} backend={jax.default_backend()}", flush=True)

    state = pinit.initialize_particles_device(n, seed=0)
    sync(state.position)
    pos = state.position
    npad = pos.shape[1]

    key = jax.random.PRNGKey(1)
    # synthetic keys with realistic skew: tile ids from the actual projection
    cfg = RenderConfig()
    cam = Camera()
    r = Renderer(cfg, k_max=k_max)

    # full render timings at a few k_max
    for km in (64, 256, k_max):
        rr = Renderer(cfg, k_max=km)
        t(f"full render k_max={km:5d}",
          lambda p, rr=rr: rr.render_arrays(p, cam, 2.5, 0.15).frame, pos)

    # ---- stage attribution with real keys ----
    from multi_adapter_particles_tpu.render import renderer as R

    gh, gw = cfg.height // R.TILE_H, cfg.width // R.TILE_W
    num_tiles = gh * gw

    @jax.jit
    def stage_keys(p):
        wvp = jnp.asarray(cam.world_view_projection(cfg.aspect))
        proj = cam.projection_matrix(cfg.aspect)
        cx, cy, hx, hy, w_clip = R._project(
            p, wvp, jnp.float32(abs(proj[0, 0])), jnp.float32(abs(proj[1, 1])),
            float(cfg.width), float(cfg.height), jnp.float32(2.5))
        x0 = jnp.maximum(jnp.ceil(cx - hx - 0.5), 0.0).astype(jnp.int32)
        y0 = jnp.maximum(jnp.ceil(cy - hy - 0.5), 0.0).astype(jnp.int32)
        tx0 = x0 // R.TILE_W
        ty0 = y0 // R.TILE_H
        dys = jnp.arange(3, dtype=jnp.int32)
        dxs = jnp.arange(2, dtype=jnp.int32)
        ty = ty0[:, None, None] + dys[None, :, None]
        tx = tx0[:, None, None] + dxs[None, None, :]
        keyv = jnp.clip(ty * gw + tx, 0, num_tiles).reshape(-1)
        return keyv

    keys = t("project+bin", stage_keys, pos)

    argsort = jax.jit(lambda kk: jnp.argsort(kk, stable=True))
    order = t("argsort (stable)", argsort, keys)

    @jax.jit
    def stage_gather(kk, od):
        sorted_key = kk[od]
        sorted_pid = (od // dup).astype(jnp.int32)
        starts = jnp.searchsorted(
            sorted_key, jnp.arange(num_tiles + 1, dtype=jnp.int32), side="left")
        kkk = jnp.arange(k_max, dtype=jnp.int32)
        gather_idx = starts[:-1, None] + kkk[None, :]
        valid = kkk[None, :] < (starts[1:] - starts[:-1])[:, None]
        pid = jnp.where(valid, sorted_pid[jnp.clip(gather_idx, 0, kk.shape[0] - 1)], 0)
        return pid

    pid = t("starts+pid gather", stage_gather, keys, order)

    @jax.jit
    def stage_scan(pidm):
        xs = (pidm.astype(jnp.float32).T,) * 8
        pxc = jnp.zeros((num_tiles, R.TILE_H * R.TILE_W), jnp.float32)

        def step(frame, sprite):
            s = sprite[0]
            alpha = jnp.clip(0.5 - jnp.abs(pxc - s[:, None]) * 1e-6, 0, 0.5)
            src = alpha[:, None, :] * 0.1
            return jnp.clip(src + frame * (1.0 - alpha[:, None, :]), 0, 1), None

        f0 = jnp.zeros((num_tiles, 3, R.TILE_H * R.TILE_W), jnp.float32)
        f, _ = jax.lax.scan(step, f0, xs)
        return f

    t(f"composite scan k={k_max}", stage_scan, pid)

    # occupancy stats for the bucketing design
    kk = np.asarray(keys)
    counts = np.bincount(kk[kk < num_tiles], minlength=num_tiles)
    counts.sort()
    print(f"tile occupancy: max={counts[-1]}, p99={counts[int(0.99*num_tiles)]}, "
          f"p90={counts[int(0.90*num_tiles)]}, median={counts[num_tiles//2]}, "
          f"mean={counts.mean():.1f}, total={counts.sum()}", flush=True)


if __name__ == "__main__":
    main()
