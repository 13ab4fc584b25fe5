"""Stage-cost attribution for the tile-binned splat renderer.

Builds truncated variants of render/_render (project -> bin/key -> sort ->
row/mask build -> composite -> combine/assembly); XLA dead-code-eliminates
everything after the cut, so successive differences attribute wall time per
stage. Mirrors the structure of `render/renderer.py:_render` — keep in sync
when that changes (profiling snapshot, not production code).

STALE as of the 4-payload-sort rework (commit "Renderer 1.9x"): this
mirror still profiles the 9-operand-sort pipeline. Post-rework @262K
1024² the production renderer measures 19-21 ms total; the remaining
split is ~9 ms stable 4-op sort (the floor — keys are 11-bit tile ids
but the TPU reorder primitive is the comparator sort), ~4 ms
project/bin/expand, ~5 ms composite, ~2 ms combine/assembly.

Run on the real chip:  python experiments/render_profile.py [N]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from multi_adapter_particles_tpu.render.renderer import (
    TILE_H, TILE_W, _colors, _project,
)


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "seg_q", "dup_y", "dup_x", "near",
                     "use_pallas_composite", "stage"),
)
def _render_upto(
    position, wvp, p00, p11, radius, intensity, num_draw,
    *, width, height, seg_q, dup_y, dup_x, near,
    use_pallas_composite, stage,
):
    n = position.shape[1]
    gh, gw = height // TILE_H, width // TILE_W
    num_tiles = gh * gw
    dup = dup_y * dup_x

    cx, cy, hx, hy, w_clip = _project(
        position, wvp, p00, p11, float(width), float(height), radius
    )
    cr, cg, cb = _colors(position, n)
    if stage == "project":
        return cx.sum() + cy.sum() + hx.sum() + hy.sum() + cr.sum() + cg.sum()

    ids = jnp.arange(n, dtype=jnp.int32)
    alive = (ids < num_draw) & (w_clip > jnp.float32(near))
    x0 = cx - hx
    x1 = cx + hx
    y0 = cy - hy
    y1 = cy + hy
    px0 = jnp.maximum(jnp.ceil(x0 - 0.5), 0.0).astype(jnp.int32)
    px1 = jnp.minimum(jnp.ceil(x1 - 0.5), width).astype(jnp.int32)
    py0 = jnp.maximum(jnp.ceil(y0 - 0.5), 0.0).astype(jnp.int32)
    py1 = jnp.minimum(jnp.ceil(y1 - 0.5), height).astype(jnp.int32)
    nonempty = (px0 < px1) & (py0 < py1) & alive
    tx0 = px0 // TILE_W
    tx1 = (px1 - 1) // TILE_W
    ty0 = py0 // TILE_H
    ty1 = (py1 - 1) // TILE_H
    dys = jnp.arange(dup_y, dtype=jnp.int32)
    dxs = jnp.arange(dup_x, dtype=jnp.int32)
    ty = ty0[:, None, None] + dys[None, :, None]
    tx = tx0[:, None, None] + dxs[None, None, :]
    ok = (
        nonempty[:, None, None]
        & (ty <= ty1[:, None, None])
        & (tx <= tx1[:, None, None])
    )
    key = jnp.where(ok, ty * gw + tx, num_tiles)
    key = key.reshape(n * dup)
    inv2hx = jnp.nan_to_num(1.0 / (2.0 * hx), nan=0.0, posinf=0.0, neginf=0.0)
    inv2hy = jnp.nan_to_num(1.0 / (2.0 * hy), nan=0.0, posinf=0.0, neginf=0.0)
    cx = jnp.nan_to_num(cx, nan=0.0, posinf=0.0, neginf=0.0)
    cy = jnp.nan_to_num(cy, nan=0.0, posinf=0.0, neginf=0.0)
    if stage == "bin":
        return key.sum() + inv2hx.sum() + inv2hy.sum()

    def expand(a):
        return jnp.broadcast_to(a[:, None], (n, dup)).reshape(-1)

    (sorted_key, s_cx, s_cy, s_ihx, s_ihy, s_cr, s_cg, s_cb) = jax.lax.sort(
        (
            key, expand(cx), expand(cy), expand(inv2hx), expand(inv2hy),
            expand(cr), expand(cg), expand(cb),
        ),
        dimension=0, num_keys=1, is_stable=True,
    )
    if stage == "sort":
        return sorted_key.sum() + s_cx.sum() + s_cr.sum() + s_ihy.sum()

    starts = jnp.searchsorted(
        sorted_key, jnp.arange(num_tiles + 1, dtype=jnp.int32), side="left"
    )
    counts = starts[1:] - starts[:-1]
    tidx = jnp.arange(num_tiles, dtype=jnp.int32)
    base_x = (tidx % gw) * TILE_W
    base_y = (tidx // gw) * TILE_H
    ly = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0)
    lx = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1)
    pxc = (base_x[:, None, None] + lx[None]).astype(jnp.float32) + 0.5
    pyc = (base_y[:, None, None] + ly[None]).astype(jnp.float32) + 0.5
    pxc = pxc.reshape(num_tiles, TILE_H * TILE_W)
    pyc = pyc.reshape(num_tiles, TILE_H * TILE_W)

    px_count = TILE_H * TILE_W
    e_total = n * dup
    q = seg_q
    data_rows = -(-e_total // q)
    e_pad = data_rows * q - e_total
    max_segs = data_rows + 1
    num_rows = num_tiles + data_rows

    ends = starts[1:]
    j_lo = starts[:-1] // q
    j_hi = jnp.where(counts > 0, (ends - 1) // q, j_lo)
    segs = jnp.where(counts > 0, j_hi - j_lo + 1, 1)
    row_end = jnp.cumsum(segs).astype(jnp.int32)
    row_start = (row_end - segs).astype(jnp.int32)
    v = jnp.arange(num_rows, dtype=jnp.int32)
    tile_v = jnp.searchsorted(row_end, v, side="right").astype(jnp.int32)
    valid_v = v < row_end[-1]
    tile_vc = jnp.clip(tile_v, 0, num_tiles - 1)
    seg_v = v - row_start[tile_vc]
    j_v = j_lo[tile_vc] + seg_v
    lo_k = jnp.clip(starts[:-1][tile_vc] - j_v * q, 0, q)
    hi_k = jnp.clip(ends[tile_vc] - j_v * q, 0, q)
    hi_k = jnp.where(valid_v & (counts[tile_vc] > 0), hi_k, 0)

    kk = jnp.arange(q, dtype=jnp.int32)
    valid_k = (kk[None, :] >= lo_k[:, None]) & (kk[None, :] < hi_k[:, None])
    sa = jnp.where(valid_k, intensity, 0.0)

    def rows(a):
        if e_pad:
            a = jnp.concatenate([a, jnp.zeros((e_pad,), a.dtype)])
        return a.reshape(data_rows, q)[j_v]

    sp = jnp.stack(
        [rows(s_cx), rows(s_cy), rows(s_ihx), rows(s_ihy),
         rows(s_cr), rows(s_cg), rows(s_cb), sa],
        axis=0,
    )
    if stage == "rowbuild":
        return sp.sum()

    if use_pallas_composite:
        from multi_adapter_particles_tpu.ops.composite import (
            composite_rows_pallas,
        )

        bases = jnp.stack(
            [
                (base_x[tile_vc]).astype(jnp.float32),
                (base_y[tile_vc]).astype(jnp.float32),
            ]
        )
        out4 = composite_rows_pallas(
            sp.transpose(0, 2, 1), bases, TILE_H, TILE_W, blend="over"
        )
        cr_v = out4[0].T
        cg_v = out4[1].T
        cb_v = out4[2].T
        tv = out4[3].T
    else:
        raise NotImplementedError("profile targets the TPU pallas path")
    if stage == "composite":
        return cr_v.sum() + cg_v.sum() + cb_v.sum() + tv.sum()

    segs_v = segs[tile_vc]
    passes = max(max_segs - 1, 0).bit_length()
    chans = [cr_v, cg_v, cb_v]
    for p in range(passes):
        s = 1 << p
        take = ((seg_v % (2 * s) == 0) & (seg_v + s < segs_v))[:, None]
        part_t = jnp.concatenate(
            [tv[s:], jnp.ones((s, px_count), jnp.float32)], axis=0
        )
        for c in range(3):
            part_c = jnp.concatenate(
                [chans[c][s:], jnp.zeros((s, px_count), jnp.float32)], axis=0
            )
            chans[c] = jnp.where(take, chans[c] * part_t + part_c, chans[c])
        tv = jnp.where(take, tv * part_t, tv)
    if stage == "combine":
        return chans[0].sum() + chans[1].sum() + chans[2].sum()

    frame_t = jnp.stack([c[row_start] for c in chans], axis=1)
    frame_t = jnp.clip(frame_t, 0.0, 1.0)
    frame = frame_t.reshape(gh, gw, 3, TILE_H, TILE_W)
    frame = frame.transpose(0, 3, 1, 4, 2).reshape(height, width, 3)
    return frame.sum()


STAGES = ["project", "bin", "sort", "rowbuild", "composite", "combine", "full"]


def main() -> int:
    from multi_adapter_particles_tpu.config import RenderConfig
    from multi_adapter_particles_tpu.models import init as pinit
    from multi_adapter_particles_tpu.render.camera import Camera
    from multi_adapter_particles_tpu.render.renderer import Renderer

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 262_144
    cfg = RenderConfig(width=1024, height=1024)
    r = Renderer(cfg)
    camera = Camera(position=cfg.camera_position)
    state = pinit.initialize_particles_device(n, seed=42)
    proj = camera.projection_matrix(cfg.aspect, cfg.fov_y, cfg.near, cfg.far)
    wvp = jnp.asarray(
        camera.world_view_projection(cfg.aspect, fov_y=cfg.fov_y,
                                     near=cfg.near, far=cfg.far)
    )
    q = r.resolve_seg_q(state.padded_count)
    print(f"backend={jax.default_backend()} n={n} seg_q={q}", flush=True)

    args = (
        state.position, wvp,
        jnp.float32(abs(proj[0, 0])), jnp.float32(abs(proj[1, 1])),
        jnp.float32(2.5), jnp.float32(0.15),
        jnp.int32(state.padded_count),
    )
    kw = dict(
        width=cfg.width, height=cfg.height, seg_q=q,
        dup_y=r.dup_y, dup_x=r.dup_x, near=cfg.near,
        use_pallas_composite=True,
    )
    reps = 20
    prev = 0.0
    for stage in STAGES:
        out = _render_upto(*args, stage=stage, **kw)   # compile
        float(out)                                     # real completion
        t0 = time.perf_counter()
        for _ in range(reps):
            out = _render_upto(*args, stage=stage, **kw)
        float(out)
        ms = (time.perf_counter() - t0) * 1000.0 / reps
        print(f"{stage:>10}: {ms:7.2f} ms cumulative  (+{ms - prev:6.2f})",
              flush=True)
        prev = ms
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
