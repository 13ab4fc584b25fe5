"""Census of live vs sentinel entries in the render front end.

The tile-binned pipeline expands each particle to dup = dup_y*dup_x
entries; a dup whose candidate tile is outside the sprite's tile span is
keyed to the sentinel (num_tiles) and rides the whole multi-operand sort
as dead weight (the composite skips it via tile starts, but the sort
cannot). This measures the live fraction and the span distribution at
the production defaults, to price the only structural E-reduction lever
left for the 4M render (ROADMAP "4M attribution").

Runs on CPU (pure front-end math, no composite): python
experiments/entry_census.py [N] [W] [H].
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4_194_304
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    h = int(sys.argv[3]) if len(sys.argv) > 3 else 1024

    from multi_adapter_particles_tpu.config import RenderConfig
    from multi_adapter_particles_tpu.models import init as pinit
    from multi_adapter_particles_tpu.render import renderer as R
    from multi_adapter_particles_tpu.render.camera import Camera

    cfg = RenderConfig(width=w, height=h)
    camera = Camera(position=cfg.camera_position)
    state = pinit.initialize_particles_device(n, seed=42)
    proj = camera.projection_matrix(cfg.aspect, cfg.fov_y, cfg.near, cfg.far)
    wvp = camera.world_view_projection(
        cfg.aspect, fov_y=cfg.fov_y, near=cfg.near, far=cfg.far
    )

    cx, cy, hx, hy, w_clip = R._project(
        state.position, jnp.asarray(wvp), jnp.float32(abs(proj[0, 0])),
        jnp.float32(abs(proj[1, 1])), float(w), float(h), jnp.float32(2.5)
    )
    cx, cy, hx, hy, w_clip = map(np.asarray, (cx, cy, hx, hy, w_clip))
    alive = w_clip > 0.1

    x0, x1 = cx - hx, cx + hx
    y0, y1 = cy - hy, cy + hy
    px0 = np.maximum(np.ceil(x0 - 0.5), 0.0).astype(np.int32)
    px1 = np.minimum(np.ceil(x1 - 0.5), w).astype(np.int32)
    py0 = np.maximum(np.ceil(y0 - 0.5), 0.0).astype(np.int32)
    py1 = np.minimum(np.ceil(y1 - 0.5), h).astype(np.int32)
    nonempty = (px0 < px1) & (py0 < py1) & alive

    tx0, tx1 = px0 // R.TILE_W, (px1 - 1) // R.TILE_W
    ty0, ty1 = py0 // R.TILE_H, (py1 - 1) // R.TILE_H
    span_x = np.where(nonempty, tx1 - tx0 + 1, 0)
    span_y = np.where(nonempty, ty1 - ty0 + 1, 0)

    ne = nonempty.sum()
    print(f"N={n} {w}x{h} TILE={R.TILE_H}x{R.TILE_W}")
    print(f"nonempty sprites: {ne} ({100.0 * ne / n:.1f}%)")
    dia_x = np.where(nonempty, px1 - px0, 0)
    dia_y = np.where(nonempty, py1 - py0, 0)
    print(f"pixel extent (nonempty mean): {dia_x.sum() / max(ne, 1):.2f} x "
          f"{dia_y.sum() / max(ne, 1):.2f}")
    for name, s, cap in (("span_x", span_x, 4), ("span_y", span_y, 4)):
        hist = [(s[nonempty] == k).mean() for k in range(1, cap + 1)]
        more = (s[nonempty] > cap).mean()
        print(f"{name}: " + " ".join(
            f"{k + 1}:{v * 100:.1f}%" for k, v in enumerate(hist))
            + f" >{cap}:{more * 100:.2f}%")

    live = (span_x * span_y).sum()
    for dup_y, dup_x in ((1, 1), (2, 1), (1, 2), (2, 2), (2, 4), (4, 2)):
        dup = dup_y * dup_x
        covered = (np.minimum(span_y, dup_y) * np.minimum(span_x, dup_x)).sum()
        trunc = live - covered
        print(f"dup {dup_y}x{dup_x}: E={n * dup / 1e6:.1f}M "
              f"live={covered / (n * dup) * 100:.1f}% "
              f"truncated={trunc} sprites>{dup_y}x{dup_x}:"
              f"{((span_y > dup_y) | (span_x > dup_x))[nonempty].mean() * 100:.2f}%")
    print(f"total live entries (exact coverage): {live / 1e6:.2f}M "
          f"= {live / n:.2f} per particle")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
