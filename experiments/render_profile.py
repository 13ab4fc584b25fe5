"""Stage-cost attribution for the q15 / 4-operand-sort renderer VARIANT
(round 3 — measured and REJECTED; production keeps the round-2 pipeline).

This mirror profiles the experimental pipeline: q15 footprint-normalized
tile-local centers packing the sprite center into ONE sort lane (4 sort
operands instead of 5), channel-blocked rowbuild, basis-free composite.
In ISOLATION the pieces beat round 2 (sort -2 ms at 2^20, rowbuild -1.7,
seg_q=128 -1.7 at 262K), but PRODUCTION A/B on the same chip/day showed
the full variant NEUTRAL at 262K (19.83 vs 19.88 ms) and 13% SLOWER at
1M (65.3 vs 56.7) — the q15 pack/unpack int chains and the per-step
du-reconstruction multiplies eat the sort saving as E grows. Kept as the
measurement artifact; render/renderer.py remains the round-2 structure.

Stage rows measured @262K 1024² (this variant): front 2.2, sort 9.7,
rowbuild 3.4, composite 3.7, combine 0.5 = 19.5; @1M: sort 39 of 61.

Run on the real chip:  python experiments/render_profile.py [N] [W] [H]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from multi_adapter_particles_tpu.render import renderer as R


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "seg_q", "dup_y", "dup_x", "near",
                     "stage"),
)
def _render_upto(
    position, wvp, p00, p11, radius, intensity, num_draw,
    *, width, height, seg_q, dup_y, dup_x, near, stage,
):
    """Truncated copy of renderer._render (Pallas composite path)."""
    n = position.shape[1]
    gh, gw = height // R.TILE_H, width // R.TILE_W
    num_tiles = gh * gw
    dup = dup_y * dup_x

    cx, cy, hx, hy, w_clip = R._project(
        position, wvp, p00, p11, float(width), float(height), radius
    )
    cr, cg, cb = R._colors(position, n)
    if stage == "project":
        return cx.sum() + cy.sum() + hx.sum() + hy.sum() + cg.sum()

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
    tx0 = px0 // R.TILE_W
    tx1 = (px1 - 1) // R.TILE_W
    ty0 = py0 // R.TILE_H
    ty1 = (py1 - 1) // R.TILE_H
    dys = jnp.arange(dup_y, dtype=jnp.int32)
    dxs = jnp.arange(dup_x, dtype=jnp.int32)
    ty = ty0[:, None, None] + dys[None, :, None]
    tx = tx0[:, None, None] + dxs[None, None, :]
    ok = (
        nonempty[:, None, None]
        & (ty <= ty1[:, None, None])
        & (tx <= tx1[:, None, None])
    )
    key = jnp.where(ok, ty * gw + tx, num_tiles).reshape(n * dup)
    cx = jnp.nan_to_num(cx, nan=0.0, posinf=0.0, neginf=0.0)
    cy = jnp.nan_to_num(cy, nan=0.0, posinf=0.0, neginf=0.0)

    def q15(v):
        v = jnp.clip(jnp.nan_to_num(v, nan=0.0, posinf=1.0, neginf=-1.0),
                     -1.0, 1.0)
        return (
            jnp.round(v * 32767.0).astype(jnp.int16)
            .view(jnp.uint16).astype(jnp.uint32)
        )

    den_x = jnp.abs(jnp.nan_to_num(hx, posinf=jnp.inf)) + jnp.float32(R.TILE_W)
    den_y = jnp.abs(jnp.nan_to_num(hy, posinf=jnp.inf)) + jnp.float32(R.TILE_H)
    rnx = (cx[:, None, None] - (tx * R.TILE_W).astype(jnp.float32)) / (
        den_x[:, None, None]
    )
    rny = (cy[:, None, None] - (ty * R.TILE_H).astype(jnp.float32)) / (
        den_y[:, None, None]
    )
    relxy = (
        jnp.left_shift(q15(jnp.broadcast_to(rnx, (n, dup_y, dup_x))), 16)
        | q15(jnp.broadcast_to(rny, (n, dup_y, dup_x)))
    ).view(jnp.float32).reshape(n * dup)
    cgb = (
        jnp.left_shift(
            jnp.clip(cg, 0.0, 6.0e4).astype(jnp.float16).view(jnp.uint16)
            .astype(jnp.uint32), 16
        )
        | cb.astype(jnp.float16).view(jnp.uint16).astype(jnp.uint32)
    ).view(jnp.float32)

    def expand(a):
        return jnp.broadcast_to(a[:, None], (n, dup)).reshape(-1)

    if stage == "bin":
        return key.sum() + relxy.view(jnp.uint32).sum() + cgb.sum()

    (sorted_key, s_relxy, s_w, s_cgb) = jax.lax.sort(
        (key, relxy, expand(w_clip), expand(cgb)),
        dimension=0, num_keys=1, is_stable=True,
    )
    if stage == "sort":
        return (sorted_key.sum() + s_relxy.view(jnp.uint32).sum()
                + s_w.sum() + s_cgb.view(jnp.uint32).sum())

    starts = jnp.searchsorted(
        sorted_key, jnp.arange(num_tiles + 1, dtype=jnp.int32), side="left"
    )
    counts = starts[1:] - starts[:-1]

    px_count = R.TILE_H * R.TILE_W
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
    valid_k = (kk[:, None] >= lo_k[None, :]) & (kk[:, None] < hi_k[None, :])
    t_sa = jnp.where(valid_k, intensity, 0.0)

    def _rows(a):
        if e_pad:
            a = jnp.concatenate([a, jnp.zeros((e_pad,), a.dtype)])
        return a.reshape(data_rows, q)

    cat = jnp.concatenate(
        [_rows(s_relxy), _rows(s_w), _rows(s_cgb)], axis=1
    )
    spt = cat[j_v].T.reshape(3, q, num_rows)

    inv_sx = 1.0 / (radius * p00 * jnp.float32(width))
    inv_sy = 1.0 / (radius * p11 * jnp.float32(height))
    t_rel = spt[0].view(jnp.uint32)
    inv_q15 = jnp.float32(1.0 / 32767.0)
    t_rnx = (
        jnp.right_shift(t_rel, 16).astype(jnp.uint16)
        .view(jnp.int16).astype(jnp.float32) * inv_q15
    )
    t_rny = (
        (t_rel & jnp.uint32(0xFFFF)).astype(jnp.uint16)
        .view(jnp.int16).astype(jnp.float32) * inv_q15
    )
    t_w = spt[1]
    t_ihx = jnp.nan_to_num(t_w * inv_sx, nan=0.0, posinf=0.0, neginf=0.0)
    t_ihy = jnp.nan_to_num(t_w * inv_sy, nan=0.0, posinf=0.0, neginf=0.0)
    t_u = spt[2].view(jnp.uint32)
    t_cb = (
        (t_u & jnp.uint32(0xFFFF)).astype(jnp.uint16)
        .view(jnp.float16).astype(jnp.float32)
    )
    t_cg = (
        jnp.right_shift(t_u, 16).astype(jnp.uint16)
        .view(jnp.float16).astype(jnp.float32)
    )
    t_cr = 1.0 - t_cb
    xs = (t_rnx, t_rny, t_ihx, t_ihy, t_cr, t_cg, t_cb, t_sa)
    if stage == "rowbuild":
        return sum(x.sum() for x in xs)

    from multi_adapter_particles_tpu.ops.composite import composite_rows_pallas

    out4 = composite_rows_pallas(jnp.stack(xs), R.TILE_H, R.TILE_W,
                                 blend="over")
    cr_v = out4[0].T
    cg_v = out4[1].T
    cb_v = out4[2].T
    tv = out4[3].T
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
    frame = frame_t.reshape(gh, gw, 3, R.TILE_H, R.TILE_W)
    frame = frame.transpose(0, 3, 1, 4, 2).reshape(height, width, 3)
    return frame.sum()


STAGES = ["project", "bin", "sort", "rowbuild", "composite", "combine", "full"]


def main() -> int:
    from multi_adapter_particles_tpu.config import RenderConfig
    from multi_adapter_particles_tpu.models import init as pinit
    from multi_adapter_particles_tpu.render.camera import Camera
    from multi_adapter_particles_tpu.render.renderer import Renderer

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 262_144
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    h = int(sys.argv[3]) if len(sys.argv) > 3 else 1024
    cfg = RenderConfig(width=w, height=h)
    r = Renderer(cfg)
    camera = Camera(position=cfg.camera_position)
    state = pinit.initialize_particles_device(n, seed=42)
    proj = camera.projection_matrix(cfg.aspect, cfg.fov_y, cfg.near, cfg.far)
    wvp = jnp.asarray(
        camera.world_view_projection(cfg.aspect, fov_y=cfg.fov_y,
                                     near=cfg.near, far=cfg.far)
    )
    q = r.resolve_seg_q(state.padded_count)
    print(f"backend={jax.default_backend()} n={n} {w}x{h} seg_q={q}",
          flush=True)

    args = (
        state.position, wvp,
        jnp.float32(abs(proj[0, 0])), jnp.float32(abs(proj[1, 1])),
        jnp.float32(2.5), jnp.float32(0.15),
        jnp.int32(state.padded_count),
    )
    kw = dict(width=w, height=h, seg_q=q, dup_y=r.dup_y, dup_x=r.dup_x,
              near=cfg.near)
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

    # seg_q sweep on the full pipeline
    for qq in (32, 64, 128, 256):
        out = _render_upto(*args, stage="full",
                           **{**kw, "seg_q": qq})
        float(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = _render_upto(*args, stage="full", **{**kw, "seg_q": qq})
        float(out)
        ms = (time.perf_counter() - t0) * 1000.0 / reps
        print(f"full @ seg_q={qq:<4}: {ms:7.2f} ms", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
