"""Pallas TPU kernel for the segmented sprite composite.

The renderer's composite scan in XLA round-trips the whole virtual
framebuffer (4 x [V, px] carry planes) through HBM on every one of Q scan
steps. This kernel holds a block of rows in VMEM for the entire Q loop, so
HBM traffic drops to: read params once + write the result once.

Layout: pixel index on sublanes, virtual rows on lanes —
- carry planes [px, VB] (px = TILE_H*TILE_W = 128 = one f32 sublane tile),
- sprite params sp [8, Q, V]: a q-step's row [1, VB] broadcasts naturally
  against [px, VB] planes. Q is consumed in sublane-aligned groups of 8
  (dynamic second-minor slices must be 8-aligned on this toolchain).

Channels: 0 cx, 1 cy, 2 1/(2hx), 3 1/(2hy), 4 r, 5 g, 6 b, 7 alpha-scale
(zero for dead slots — blending a no-op). Output [4, px, V]: premultiplied
r, g, b and transmittance, ready for the log-depth segment combine.

Semantics identical to the XLA scan in render/renderer.py (associative
over-composition with per-sprite source clamp); tests pin equivalence.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multi_adapter_particles_tpu.ops.dispatch import interpret_flag


def _kernel(ng_ref, sp_ref, base_ref, out_ref, *, q_len, tile_h, tile_w,
            blend):
    vb = out_ref.shape[2]
    px = tile_h * tile_w

    pix = jax.lax.broadcasted_iota(jnp.int32, (px, vb), 0)
    x_in = (pix % tile_w).astype(jnp.float32)
    y_in = (pix // tile_w).astype(jnp.float32)
    pxc = base_ref[0:1, :] + x_in + 0.5     # [px, VB]
    pyc = base_ref[1:2, :] + y_in + 0.5

    def blend_group(qg, carry):
        cr, cg, cb, tt = carry
        g = [sp_ref[c, pl.ds(qg * 8, 8), :] for c in range(8)]  # [8, VB] x8
        for r in range(8):
            scx = g[0][r : r + 1, :]
            scy = g[1][r : r + 1, :]
            ihx = g[2][r : r + 1, :]
            ihy = g[3][r : r + 1, :]
            sr = g[4][r : r + 1, :]
            sg = g[5][r : r + 1, :]
            sb = g[6][r : r + 1, :]
            sa = g[7][r : r + 1, :]
            du = (pxc - scx) * ihx
            dv = (pyc - scy) * ihy
            dist = jnp.sqrt(du * du + dv * dv)
            alpha = jnp.clip(0.5 - dist, 0.0, 0.5) * sa      # [px, VB]
            if blend == "over":
                keep = 1.0 - alpha
                cr = cr * keep + jnp.clip(sr * alpha, 0.0, 1.0)
                cg = cg * keep + jnp.clip(sg * alpha, 0.0, 1.0)
                cb = cb * keep + jnp.clip(sb * alpha, 0.0, 1.0)
                tt = tt * keep
            else:  # additive
                cr = cr + jnp.clip(sr * alpha, 0.0, 1.0)
                cg = cg + jnp.clip(sg * alpha, 0.0, 1.0)
                cb = cb + jnp.clip(sb * alpha, 0.0, 1.0)
        return cr, cg, cb, tt

    zero = jnp.zeros((px, vb), jnp.float32)
    one = jnp.ones((px, vb), jnp.float32)
    # Dynamic trip count: this block only loops over Q-groups that hold a
    # live slot in SOME of its rows (ng = max over the block's rows of
    # ceil(row_hi/8), prefetched per block). Groups past every row's hi
    # blend alpha-scale 0 -> exact identity (x*1 == x, +0 stays +0), so
    # skipping them is bitwise-equal to the full loop; dead-tail blocks
    # (ng == 0) write the identity carries outright. At 4M the virtual-row
    # tail past row_end[-1] is ~40% of V — all skipped.
    ng = ng_ref[pl.program_id(0)]
    cr, cg, cb, tt = jax.lax.fori_loop(
        0, ng, blend_group, (zero, zero, zero, one)
    )
    out_ref[0, :, :] = cr
    out_ref[1, :, :] = cg
    out_ref[2, :, :] = cb
    out_ref[3, :, :] = tt


@functools.partial(
    jax.jit, static_argnames=("tile_h", "tile_w", "blend", "vb")
)
def composite_rows_pallas(
    sp: jax.Array,      # [8, Q, V] sprite params (Q multiple of 8)
    bases: jax.Array,   # [2, V] float32 tile base pixel coords (x, y)
    tile_h: int,
    tile_w: int,
    blend: str = "over",
    vb: int = 256,
    row_hi: jax.Array | None = None,  # [V] int32 live-slot bound per row
) -> jax.Array:
    """-> [4, px, V]: premultiplied rgb + transmittance per virtual row.

    `row_hi[v]` (optional) is the exclusive upper bound of row v's live
    slots (the renderer's hi_k; 0 for dead rows). Slots at or past it
    carry alpha-scale 0, so each grid block's Q loop runs only to the max
    ceil(row_hi/8) over its rows — bitwise-equal to the full loop (zero
    alpha blends as exact identity) but skipping the dead virtual-row
    tail, ~40% of V at the 4M default. None -> every block loops full Q.

    vb=256 measured best with the skip (experiments/composite_vb.py,
    2026-08-19 on chip, bitwise-equal at every width): a narrower block
    tightens the max-row_hi trip bound vs 512 at all sizes (262K 11.88
    -> 10.66 ms, 1M 26.58 -> 25.01, 4M 95.87 -> 90.81 render-only);
    128 edges it at 262K (10.42) but regresses at 4M (97.88).
    """
    _, q_len, v = sp.shape
    if q_len % 8:
        raise ValueError("Q must be a multiple of 8")
    # pad the row axis to the block multiple (lane dims must be 128-divisible
    # blocks); padded rows have zero alpha-scale -> identity composites
    pad = (-v) % vb
    if pad:
        sp = jnp.pad(sp, ((0, 0), (0, 0), (0, pad)))
        bases = jnp.pad(bases, ((0, 0), (0, pad)))
    vp = v + pad
    px = tile_h * tile_w

    if row_hi is None:
        blk_ng = jnp.full((vp // vb,), q_len // 8, jnp.int32)
    else:
        hi = jnp.clip(row_hi.astype(jnp.int32), 0, q_len)
        if pad:
            hi = jnp.pad(hi, (0, pad))
        blk_hi = jnp.max(hi.reshape(vp // vb, vb), axis=1)
        blk_ng = (blk_hi + 7) // 8

    kernel = functools.partial(
        _kernel, q_len=q_len, tile_h=tile_h, tile_w=tile_w, blend=blend
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(vp // vb,),
        in_specs=[
            pl.BlockSpec((8, q_len, vb), lambda i, ng: (0, 0, i)),
            pl.BlockSpec((2, vb), lambda i, ng: (0, i)),
        ],
        out_specs=pl.BlockSpec((4, px, vb), lambda i, ng: (0, 0, i)),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((4, px, vp), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(vp) * int(q_len) * px * 14,
            bytes_accessed=int(vp) * (q_len * 32 + px * 16 + 8),
            transcendentals=int(vp) * int(q_len) * px,
        ),
        interpret=interpret_flag(),
    )(blk_ng, sp, bases)
    return out[:, :, :v] if pad else out
