"""Block-sparse exact near field: the tree-structured P³M near mode.

The static-K cell-list sweep (`ops/p3m.py:near_field_correction`) pads
EVERY cell to one capacity, so a scene with extreme density contrast (the
demo's two-cluster shell init packs thousands of particles into single
near cells — 97% overflow at 65K with any practical K) either loses the
near correction exactly where it matters or pays gn³·27·K² padded work.
This module is the hierarchical fix (VERDICT r2 #2), built TPU-first —
sorts and gathers, no scatters, no data-dependent shapes:

1. ONE Morton sort of the particles. Blocks of B consecutive
   Morton-sorted particles are compact, octree-aligned spatial nodes —
   the "tree" is implicit in the code order.
2. Per-block cell-space AABBs via masked segment min/max (node bounds).
3. The dual-tree walk, flattened: an [NB, NB] bbox-adjacency test, then
   ONE stable sort compacts the true entries into an i-major block-pair
   list under a static budget (dropped pairs are counted, never silent).
4. Direct interactions: a chunked B×B pairwise sweep over the listed
   pairs (sources on lanes, targets on sublanes — the `ops/p3m.py`
   layout lesson), accumulated per target block by a sorted segment sum
   and un-sorted back to particle order with one payload sort.

Work scales with the scene's ACTUAL near-pair count — dense cores simply
contribute more block pairs — never with a global max cell capacity.

Pair-set contract: every pair with |cell Δ|∞ ≤ 1 (the 27-neighborhood of
the slot sweep) is included; bbox adjacency may ADD farther pairs whose
short-range factor has already decayed to ≤1.4e-4 of exact, so the
result is equal to or strictly closer to the exact force than the slot
sweep on any scene (`tests/test_treeforce.py` pins both properties).

Reference lineage: subsumes the exactness of the reference's
bodyBodyInteraction O(N²) sum (`nBodyGravityCS.hlsl:44-57`) at
sub-quadratic cost on ANY particle distribution — the reference's only
exact mode cannot be beaten on generality, so this matches it where the
slot sweep could not (the demo init) while keeping the mesh's O(N) far
field.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multi_adapter_particles_tpu.ops import pm
from multi_adapter_particles_tpu.ops.dispatch import interpret_flag
from multi_adapter_particles_tpu.ops.p3m import _SIGMA_PER_CUTOFF

# np scalar, NOT jnp: a module-level jnp constant initializes the JAX
# backend at import time (which hangs/fails library import when no
# backend is reachable, e.g. the TPU tunnel is down)
_PARK = np.float32(1.0e9)

# -- Polynomial short-range factor (no erf/exp in the hot loop) --------------
# s_short(r) = s_exact - g_long needs erf + exp per pair (most of the
# sweep's per-pair ops, and Mosaic has no erf primitive at all). The
# combined Ewald numerator G(t) = g_long * r^3 (t = r/sigma) is UNIVERSAL
# and satisfies G(t) = sqrt(2/pi) * Int_0^t s^2 e^(-s^2/2) ds — positive,
# no cancellation — so H(v) = G(t)/t^3 (v = t^2) is smooth on [0, t_c^2]
# and a degree-12 least-squares polynomial (fit in the mapped variable
# x = 2v/VMAX - 1 for conditioning, evaluated by 12-FMA HORNER — measured
# identical accuracy to the 24-FMA Clenshaw form: maxrel 5.1e-6 vs the
# f64 truth at every separation) reproduces the force to ~1e-5 of EXACT.
# Beyond the cutoff the factor is set to 0 — inside the 1.4e-4 truncation
# budget the 27-neighborhood already implies.
_TC = 4.5                      # cutoff in t = r/sigma units (= r_c/sigma)
_VMAX = _TC * _TC
_POLY_DEG = 12


def _fit_h_poly():
    """Host-side degree-12 monomial fit of H(v) on [0, VMAX] (f64),
    in the mapped variable x = 2v/VMAX - 1."""
    import math

    import numpy as np

    v = np.linspace(0.0, _VMAX, 8001)
    t = np.sqrt(v)
    # series for small t (alternating, converges fast for v <= 4):
    #   H(v) = sqrt(2/pi) * sum_n (-v/2)^n / (n! (2n+3))
    hs = np.zeros_like(v)
    term = np.ones_like(v)
    for n in range(0, 40):
        hs += term / (2 * n + 3)
        term = term * (-v / 2) / (n + 1)
    hs *= math.sqrt(2.0 / math.pi)
    # exact formula for large t (no cancellation there)
    erf_v = np.vectorize(math.erf)
    with np.errstate(divide="ignore", invalid="ignore"):
        he = (
            erf_v(t / math.sqrt(2.0))
            - math.sqrt(2.0 / math.pi) * t * np.exp(-v / 2.0)
        ) / np.maximum(t, 1e-30) ** 3
    h = np.where(v <= 4.0, hs, he)
    x = 2.0 * v / _VMAX - 1.0
    import numpy.polynomial.polynomial as _P

    return _P.polyfit(x, h, _POLY_DEG).astype(np.float32)


_H_POLY = tuple(float(c) for c in _fit_h_poly())


def _fit_e_poly():
    """Host-side degree-12 monomial fit of E(v) = erf(t/sqrt(2))/t
    (t = r/sigma, v = t²) on [0, VMAX], mapped x = 2v/VMAX - 1 — the
    long-range pair POTENTIAL numerator (u_long = -E/sigma), companion
    of `_fit_h_poly`'s force numerator."""
    import math

    import numpy as np

    v = np.linspace(0.0, _VMAX, 8001)
    t = np.sqrt(v)
    # series: E(v) = sqrt(2/pi) * sum_n (-v/2)^n / (n! (2n+1))
    es = np.zeros_like(v)
    term = np.ones_like(v)
    for n in range(0, 40):
        es += term / (2 * n + 1)
        term = term * (-v / 2) / (n + 1)
    es *= math.sqrt(2.0 / math.pi)
    erf_v = np.vectorize(math.erf)
    with np.errstate(divide="ignore", invalid="ignore"):
        ee = erf_v(t / math.sqrt(2.0)) / np.maximum(t, 1e-30)
    e = np.where(v <= 4.0, es, ee)
    x = 2.0 * v / _VMAX - 1.0
    import numpy.polynomial.polynomial as _P

    return _P.polyfit(x, e, _POLY_DEG).astype(np.float32)


_E_POLY = tuple(float(c) for c in _fit_e_poly())


def short_potential_cheb(d2, eps2, sigma):
    """Polynomial short-range pair POTENTIAL u_short(r) = u_exact - u_long:

        u_exact = -(d² + eps²)^(-1/2)      (softened Plummer)
        u_long  = -erf(r/(sqrt(2)σ)) / r   (Gaussian-smoothed source)

    the potential whose gradient is `short_factor_cheb`'s force
    (du/dr = r * s_short). Same construction: the erf numerator is
    evaluated as a degree-12 Horner polynomial in v = (r/σ)² (finite at
    r = 0: E(0) = sqrt(2/π)), exactly 0 beyond the cutoff (the truncated
    tail there is erfc(4.5/√2)/r ≈ 7e-6/r). Pallas-legal (rsqrt + FMAs).

    NOTE the self-pair: at d2 == 0 this returns sqrt(2/π)/σ - 1/eps
    (NOT zero, unlike the force where r_vec = 0 kills it) — callers must
    subtract that constant once per live particle."""
    u_exact = -jax.lax.rsqrt(d2 + jnp.float32(eps2))
    v = d2 * jnp.float32(1.0 / (sigma * sigma))
    x = jnp.clip(v * jnp.float32(2.0 / _VMAX) - 1.0, -1.0, 1.0)
    e = jnp.full_like(x, jnp.float32(_E_POLY[-1]))
    for c in _E_POLY[-2::-1]:
        e = e * x + jnp.float32(c)
    u = u_exact + e * jnp.float32(1.0 / sigma)
    return jnp.where(v <= jnp.float32(_VMAX), u, 0.0)


def short_potential_self(eps2: float, sigma: float) -> float:
    """u_short(0) — the self-pair constant every live particle picks up
    exactly once in a potential sweep (its own block pairs with itself).
    Evaluated through the SAME f32 Horner polynomial as the sweep so the
    subtraction cancels the self-term exactly (the analytic sqrt(2/π)
    differs from the fit by ~5e-6, which would otherwise accumulate
    N-fold in the total)."""
    e = np.float32(_E_POLY[-1])
    for c in _E_POLY[-2::-1]:
        e = e * np.float32(-1.0) + np.float32(c)     # x(v=0) = -1
    u_exact0 = -np.float32(1.0) / np.float32(np.sqrt(np.float32(eps2)))
    return float(u_exact0 + e * np.float32(1.0 / sigma))


def short_factor_cheb(d2, eps2, sigma):
    """Polynomial s_short: bit-compatible SEMANTICS with p3m._short_factor
    to ~1e-5 of the exact force inside the cutoff, exactly 0 beyond it.
    Pallas-legal (rsqrt + FMAs only); ~33 ops/pair vs the erf form's ~55
    (name kept from the Chebyshev-basis original — same fit, now evaluated
    by Horner at half the FMAs)."""
    inv = jax.lax.rsqrt(d2 + jnp.float32(eps2))
    s_exact = inv * inv * inv
    v = d2 * jnp.float32(1.0 / (sigma * sigma))
    x = jnp.clip(v * jnp.float32(2.0 / _VMAX) - 1.0, -1.0, 1.0)
    h = jnp.full_like(x, jnp.float32(_H_POLY[-1]))
    for c in _H_POLY[-2::-1]:
        h = h * x + jnp.float32(c)
    s = s_exact - h * jnp.float32(1.0 / sigma**3)
    return jnp.where(v <= jnp.float32(_VMAX), s, 0.0)


# -- Pallas sweep kernel ------------------------------------------------------
# DMA ring depth: a [4, B] source tile is only ~4 KB, so the copy is
# LATENCY-bound (~1 us issue+latency vs ~0.3 us of B=256 pair math) — a
# double buffer leaves the sweep DMA-bound at ~2.8x off the dense-kernel
# rate. Keep _RING-1 copies in flight instead; slot t is re-filled one
# iteration after its compute (the dense kernel's reuse discipline).
_RING = 8

# Widest target/source block the VMEM sweep takes directly: the kernel's
# [B, B] pair planes are B²·4 bytes a piece (512 -> 1 MiB; 2048 would be
# 16 MiB — past VMEM). Wider tree blocks are sub-block-split for the
# sweep (see near_field_tree).
_SWEEP_MAX_BLOCK = 512


def _sweep_kernel(
    bounds_ref,   # SMEM [nb+1] int32 (prefetch): per-target pair-list range
    jidx_ref,     # SMEM [ceil(p_max/2)] int32 (prefetch): source block per
    #               pair, two uint16 halves per word (low half = even pair)
    spos_hbm,     # [4, nb*B] ANY — sorted positions, j-stream via DMA
    pos_i,        # [4, B] VMEM — this target block (x, y, z, 0 rows)
    out_ref,      # [4, B] VMEM — near acceleration (x, y, z, 0 rows)
    buf,          # [_RING, 4, B] VMEM scratch — ring of source blocks
    sem,          # [_RING] DMA semaphores
    *,
    block: int,
    eps2: float,
    sigma: float,
    with_potential: bool = False,
    potential_only: bool = False,
    half_pairs: bool = False,
):
    # Targets and output ride the SAME [4, nb*B] SoA array as the
    # j-stream: a [nb*B, 4] operand/result lane-pads 4 -> 128 in the
    # tiled layout — 2 GB per sweep slice at 4M, and the sliced
    # invocations' outputs stay live together: the G=192@4M program
    # measured 16.02 GB of HLO temp at 3.2% utilization (2026-08-19,
    # compile dump) vs ~1 GB in this orientation. The i-rows are
    # transposed to [B, 1] columns ONCE per target block with an
    # arithmetic one-hot reduction (Mosaic-legal: int compare inside
    # where, the ops/sortkv.py pattern; exact — products are x*1 or
    # x*0), amortized over the block's whole pair sweep.
    i = pl.program_id(0)
    s = bounds_ref[i]
    e = bounds_ref[i + 1]
    i0 = jax.lax.broadcasted_iota(jnp.int32, (block, block), 0)
    i1 = jax.lax.broadcasted_iota(jnp.int32, (block, block), 1)
    d01 = (i0 - i1) * (i0 - i1)
    eye = jnp.where(d01 > 0, jnp.float32(0.0), jnp.float32(1.0))

    def _col(row):  # [1, B] -> [B, 1]
        return jnp.sum(eye * row, axis=1, keepdims=True)

    def _row(col):  # [B, 1] -> [1, B]
        return jnp.sum(eye * col, axis=0, keepdims=True)

    xi = _col(pos_i[0:1, :])   # [B, 1]
    yi = _col(pos_i[1:2, :])
    zi = _col(pos_i[2:3, :])

    def jof(t):
        # j_idx rides SMEM as two uint16 halves per int32 word (doubles
        # the pair-list capacity under the 1 MiB SMEM roof; block ids
        # fit uint16 — the nb<=2048 adaptive cap, and sub-block
        # expansion guards sweep_nb < 2^16)
        word = jidx_ref[t >> 1]
        return jax.lax.shift_right_logical(
            word, (t & 1) * 16
        ) & jnp.int32(0xFFFF)

    def dma(slot, t):
        return pltpu.make_async_copy(
            spos_hbm.at[:, pl.ds(jof(t) * block, block)],
            buf.at[slot],
            sem.at[slot],
        )

    def body(t, acc):
        ax, ay, az, au = acc
        slot = jax.lax.rem(t - s, _RING)

        @pl.when(t + _RING - 1 < e)
        def _():
            # slot of t+_RING-1 == slot of t-1: its compute finished last
            # iteration, the ring stays _RING-1 deep
            dma(jax.lax.rem(t - s + _RING - 1, _RING), t + _RING - 1).start()

        dma(slot, t).wait()
        tile = buf[slot]
        dx = tile[0:1, :] - xi       # [B, B] sources on lanes
        dy = tile[1:2, :] - yi
        dz = tile[2:3, :] - zi
        d2 = dx * dx + dy * dy + dz * dz
        if with_potential:
            # diagnostics variant: channel 3 (a zero row in the force-only
            # trace) carries the short-range pair potential sum
            u = short_potential_cheb(d2, eps2, jnp.float32(sigma))
            us = jnp.sum(u, axis=1, keepdims=True)
            if half_pairs:
                # Newton-3rd halved pair list: the diagonal block pair is
                # the one survivor whose [B, B] plane still holds BOTH
                # orderings of its in-block pairs (plus each lane's self
                # pair) — weight it 1/2 so every unordered pair lands in
                # the total exactly once (self terms at 1/2, matched by
                # the caller's halved self-constant subtraction).
                w = jnp.where(
                    jof(t) == i, jnp.float32(0.5), jnp.float32(1.0)
                )
                us = us * w
            au = au + us
        if potential_only:
            # the gauge reuses the run's own accel for the half-kick
            # (VERDICT r4 #4): skip the force factor + 3 accumulate
            # chains — ~2x fewer pair ops than the fused variant
            return (ax, ay, az, au)
        f = short_factor_cheb(d2, eps2, jnp.float32(sigma))
        return (
            ax + jnp.sum(dx * f, axis=1, keepdims=True),
            ay + jnp.sum(dy * f, axis=1, keepdims=True),
            az + jnp.sum(dz * f, axis=1, keepdims=True),
            au,
        )

    zero = jnp.zeros((block, 1), jnp.float32)

    def prologue(r):
        @pl.when(s + r < e)
        def _():
            dma(jnp.int32(r), s + r).start()

    for r in range(_RING - 1):
        prologue(r)

    ax, ay, az, au = jax.lax.fori_loop(s, e, body, (zero, zero, zero, zero))
    out_ref[:, :] = jnp.concatenate(
        [
            _row(ax), _row(ay), _row(az),
            _row(au) if with_potential
            else jnp.zeros((1, block), jnp.float32),
        ],
        axis=0,
    )


def _near_sweep_pallas(sx, sy, sz, bounds, j_idx, *, nb, block, eps2, sigma,
                       with_potential=False, potential_only=False,
                       half_pairs=False):
    """[4, nb*B] per-particle near sums (sorted order) via the VMEM sweep;
    channel 3 is the short-range pair potential when `with_potential`
    (zeros otherwise — the force-only trace pays no extra pair ops).

    Grid walks target blocks; each streams its neighbor-list source blocks
    (prefetched scalars) HBM->VMEM double-buffered, accumulating [B, 1]
    register columns — the ops/allpairs.py pipeline steered by the
    dual-tree pair list instead of a dense j-range. The one [4, nb*B]
    SoA array serves BOTH the blocked target operand and the DMA'd
    j-stream (see `_sweep_kernel` on why no [nb*B, 4] form may exist)."""
    import functools

    spos = jnp.stack([sx, sy, sz, jnp.zeros_like(sx)])        # [4, nb*B]
    # pack j_idx as two uint16 halves per int32 word (see _sweep_kernel)
    p = j_idx.shape[0]
    j16 = j_idx.astype(jnp.uint32)
    if p % 2:
        j16 = jnp.concatenate([j16, jnp.zeros((1,), jnp.uint32)])
    jpacked = (
        j16[0::2] | (j16[1::2] << jnp.uint32(16))
    ).astype(jnp.int32)
    kernel = functools.partial(
        _sweep_kernel, block=block, eps2=float(eps2), sigma=float(sigma),
        with_potential=with_potential, potential_only=potential_only,
        half_pairs=half_pairs,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((4, block), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((4, block), lambda i, *_: (0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((_RING, 4, block), jnp.float32),
            pltpu.SemaphoreType.DMA((_RING,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((4, nb * block), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret_flag(),
    )(bounds, jpacked, spos, spos)
    return out


# j-accumulator VMEM budget for the Newton-3rd force sweep: one band of
# kb source blocks lives in scratch ([4, kb*B] f32) AND as the call's
# VMEM output block — the budget is paid TWICE, next to the [B, B] pair
# planes. B <= 256 planes are small (4 MB bands fit: 262K = ONE band);
# B = 512 planes are ~10 MB so bands cap at 2 MB (4 MB measured OOM:
# 18.32M > 16M scoped, 2026-08-21 1M run).
_N3_JACC_FLOATS = 1 << 20        # block <= 256
_N3_JACC_FLOATS_WIDE = 1 << 19   # block == 512

# Band-count gate: the sweep's 8 KB source tiles are LATENCY-bound and
# the _RING pipeline only pays off when each (band, target) pair
# segment keeps it full. Banding splits every target's stream nbands
# ways: measured 2026-08-21 — 262K/B=256 one band -9.2% (130.4 ->
# 118.4 ms), 1M/B=512 eight bands +23% (596.1 -> 734.8 ms; ~4 pairs
# per segment vs the 8-deep ring). Past this cap the directed sweep
# wins and the gate falls back. The known structural fix is a rolling
# j-window (flush block i's accumulator row through target i's own
# output block — single segment per target, no bands) with an
# out-of-window directed residual list; unbuilt, see ROADMAP.
_N3_MAX_BANDS = 2


def _n3_kb(nb: int, block: int) -> int:
    floats = _N3_JACC_FLOATS if block <= 256 else _N3_JACC_FLOATS_WIDE
    return max(1, min(nb, floats // (4 * block)))


def _sweep_kernel_n3(
    bounds_ref,   # SMEM [nb+1] int32 (prefetch): ABSOLUTE [s, e) of THIS
    #               band's pairs per target in the band-major-sorted list
    jidx_ref,     # SMEM [ceil(p/2)] int32 (prefetch): the FULL halved
    #               band-major pair list, two uint16 halves per word
    spos_hbm,     # [4, nb*B] ANY — sorted positions, j-stream via DMA
    pos_i,        # [4, B] VMEM — this target block
    iacc_out,     # [4, B] VMEM — i-side near accel for this target
    jacc_out,     # [4, kb*B] VMEM — this band's j-side accel (negated
    #               sublane sums), emitted once at the last grid step
    buf,          # [_RING, 4, B] VMEM scratch — ring of source blocks
    jacc,         # [4, kb*B] VMEM scratch — persistent across the grid
    sem,          # [_RING] DMA semaphores
    *,
    block: int,
    kb: int,
    band_lo: int,
    eps2: float,
    sigma: float,
):
    """Newton-3rd halved force sweep (round 5): each unordered block
    pair (i <= j) is listed once; its [B, B] pair plane is computed once
    and applied to BOTH sides — the i-side as lane reductions (exactly
    `_sweep_kernel`'s chains), the j-side as NEGATED sublane reductions
    into a persistent VMEM accumulator holding one band of kb source
    blocks (the `ops/allpairs.py` half-pair v7 structure steered by the
    dual-tree pair list). Diagonal pairs skip the j-side: their dense
    plane already holds both in-block orderings, so the lane sums alone
    reproduce the directed sweep's in-block forces. Pair math
    (short_factor_cheb, ~27 of the 33 ops/pair) is paid once per
    unordered pair instead of twice."""
    i = pl.program_id(0)
    s = bounds_ref[i]
    e = bounds_ref[i + 1]

    @pl.when(i == 0)
    def _():
        jacc[...] = jnp.zeros_like(jacc)

    i0 = jax.lax.broadcasted_iota(jnp.int32, (block, block), 0)
    i1 = jax.lax.broadcasted_iota(jnp.int32, (block, block), 1)
    d01 = (i0 - i1) * (i0 - i1)
    eye = jnp.where(d01 > 0, jnp.float32(0.0), jnp.float32(1.0))

    def _col(row):  # [1, B] -> [B, 1]
        return jnp.sum(eye * row, axis=1, keepdims=True)

    def _row(col):  # [B, 1] -> [1, B]
        return jnp.sum(eye * col, axis=0, keepdims=True)

    xi = _col(pos_i[0:1, :])
    yi = _col(pos_i[1:2, :])
    zi = _col(pos_i[2:3, :])

    def jof(t):
        word = jidx_ref[t >> 1]
        return jax.lax.shift_right_logical(
            word, (t & 1) * 16
        ) & jnp.int32(0xFFFF)

    def dma(slot, t):
        return pltpu.make_async_copy(
            spos_hbm.at[:, pl.ds(jof(t) * block, block)],
            buf.at[slot],
            sem.at[slot],
        )

    def body(t, acc):
        ax, ay, az = acc
        slot = jax.lax.rem(t - s, _RING)

        @pl.when(t + _RING - 1 < e)
        def _():
            dma(jax.lax.rem(t - s + _RING - 1, _RING), t + _RING - 1).start()

        dma(slot, t).wait()
        j = jof(t)
        tile = buf[slot]
        dx = tile[0:1, :] - xi       # [B, B] sources on lanes
        dy = tile[1:2, :] - yi
        dz = tile[2:3, :] - zi
        d2 = dx * dx + dy * dy + dz * dz
        f = short_factor_cheb(d2, eps2, jnp.float32(sigma))
        tx = dx * f
        ty = dy * f
        tz = dz * f

        @pl.when(j > i)
        def _():
            # force on the source block's particles: -sum over targets
            sl = pl.ds((j - band_lo) * block, block)
            jacc[0, sl] -= jnp.sum(tx, axis=0)
            jacc[1, sl] -= jnp.sum(ty, axis=0)
            jacc[2, sl] -= jnp.sum(tz, axis=0)

        return (
            ax + jnp.sum(tx, axis=1, keepdims=True),
            ay + jnp.sum(ty, axis=1, keepdims=True),
            az + jnp.sum(tz, axis=1, keepdims=True),
        )

    zero = jnp.zeros((block, 1), jnp.float32)

    def prologue(r):
        @pl.when(s + r < e)
        def _():
            dma(jnp.int32(r), s + r).start()

    for r in range(_RING - 1):
        prologue(r)

    ax, ay, az = jax.lax.fori_loop(s, e, body, (zero, zero, zero))
    iacc_out[:, :] = jnp.concatenate(
        [_row(ax), _row(ay), _row(az),
         jnp.zeros((1, block), jnp.float32)],
        axis=0,
    )

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        jacc_out[...] = jacc[...]


def _near_sweep_pallas_n3(sx, sy, sz, sweep_i, sweep_j, *, nb, block,
                          eps2, sigma):
    """Newton-3rd halved force sweep -> [4, nb*B] near sums (sorted
    order). `sweep_i`/`sweep_j` is the HALVED pair list (j >= i for live
    pairs, i = nb sentinels for dead ones).

    The list is re-sorted band-major (band(j) = j // kb major, i minor)
    so each band's pairs form one contiguous range; `pm._segment_bounds`
    over the composite key yields per-(band, target) ABSOLUTE bounds
    into the one shared SMEM pair list, and each band runs one
    pallas_call whose persistent [4, kb*B] VMEM accumulator collects the
    j-side. i-side partials and per-band j-side slices add by linearity.
    At the 262K demo (nb*B = 256K = `_N3_JACC_FLOATS`) this is a single
    band-free call."""
    import functools

    kb = _n3_kb(nb, block)
    nbands = -(-nb // kb)
    live = sweep_i < nb
    band = jnp.minimum(sweep_j // kb, nbands - 1)
    key = jnp.where(live, band * nb + sweep_i, nbands * nb)
    skey, sj = jax.lax.sort(
        (key, sweep_j), dimension=0, num_keys=1, is_stable=True
    )
    bounds_all = pm._segment_bounds(skey, nbands * nb)  # [nbands*nb + 1]

    p = sj.shape[0]
    j16 = sj.astype(jnp.uint32)
    if p % 2:
        j16 = jnp.concatenate([j16, jnp.zeros((1,), jnp.uint32)])
    jpacked = (
        j16[0::2] | (j16[1::2] << jnp.uint32(16))
    ).astype(jnp.int32)

    spos = jnp.stack([sx, sy, sz, jnp.zeros_like(sx)])
    acc = jnp.zeros((4, nb * block), jnp.float32)
    for b in range(nbands):
        kbb = min(kb, nb - b * kb)
        kernel = functools.partial(
            _sweep_kernel_n3, block=block, kb=kbb, band_lo=b * kb,
            eps2=float(eps2), sigma=float(sigma),
        )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((4, block), lambda i, *_: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((4, block), lambda i, *_: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((4, kbb * block), lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((_RING, 4, block), jnp.float32),
                pltpu.VMEM((4, kbb * block), jnp.float32),
                pltpu.SemaphoreType.DMA((_RING,)),
            ],
        )
        iacc, jacc = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((4, nb * block), jnp.float32),
                jax.ShapeDtypeStruct((4, kbb * block), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
            interpret=interpret_flag(),
        )(bounds_all[b * nb:(b + 1) * nb + 1], jpacked, spos, spos)
        acc = acc + iacc
        lo = b * kb * block
        acc = acc.at[:, lo:lo + kbb * block].add(jacc)
    return acc


def _morton(ib, bits: int):
    """[3, N] int cell coords in [0, 2^bits) -> interleaved Morton code.

    3*bits <= 30 keeps the code (plus the sentinel above it) in int32."""
    code = jnp.zeros_like(ib[0])
    for b in range(bits):
        for c in range(3):
            code = code | (((ib[c] >> b) & 1) << (3 * b + c))
    return code


def default_pair_budget(num_blocks: int) -> int:
    """Static block-pair budget: generous for uniform scenes (a block has
    ~27-60 bbox neighbors), with headroom for clustered ones; always at
    least the full matrix for tiny inputs."""
    return int(min(num_blocks * num_blocks, max(4096, 64 * num_blocks)))


def default_block(n: int) -> int:
    """Block size keeping the [NB, NB] adjacency matrix (and its
    compaction sort) bounded: NB <= ~2048, so the dual-tree walk stays a
    few-ms side cost from 64K to multi-million particles."""
    b = 256
    while -(-n // b) > 2048:
        b *= 2
    return b


def near_field_tree(
    position: jax.Array,   # [4, N]
    box: float,
    g_const: float,
    eps2: float,
    r_c: float,
    near_grid: int,
    block: int | None = None,
    pair_budget: int | None = None,
    pair_chunk: int | None = None,
    sweep_slice_cap: int | None = None,
    sub_pair_budget: int | None = None,
    block_owner_fn=None,
    with_potential: bool = False,
    potential_only: bool = False,
    half_pairs: bool = False,
    total_only: bool = False,
    half_force: bool = False,
):
    """Short-range pairwise correction -> (accel [3, N], dropped_pairs).

    Same force split as `p3m.near_field_correction` (accel = g_const *
    s_short(r) * r_vec summed over near pairs); `near_grid` cells must be
    >= r_c wide so bbox adjacency covers the cutoff. `dropped_pairs`
    counts block pairs beyond `pair_budget` (0 = nothing truncated).
    `block` None = adaptive (NB capped ~2048); `pair_chunk` None scales
    inversely with block² so a sweep chunk stays ~100 MB.
    `sweep_slice_cap` overrides the SMEM-derived per-invocation pair cap
    of the Pallas sweep (tests force the sliced path with a tiny cap).
    `sub_pair_budget` (wide-block scenes only; see `host_sub_pair_budget`)
    truncates the expanded sub-pair list after AABB pruning — normally
    shedding only pruned sentinel tail entries, so giant scenes pack
    fewer SMEM slices; any live shortfall is counted in dropped_pairs.
    `block_owner_fn` (mesh runs): callable mapping target block ids
    [P] int32 -> bool "this device owns these targets"; non-owned pairs
    are skipped, so the per-device result is a PARTIAL near field —
    psum it over the mesh (each target block is owned exactly once).
    dropped_pairs stays a GLOBAL count, identical on every device.
    `with_potential` (diagnostics): also return the per-particle
    short-range pair potential u_i = g * sum_j u_short(r_ij) [N] (self
    term removed, out-of-box particles 0; owner-masked like the force,
    so psum composes) -> (accel, u, dropped_pairs). The force-only
    trace is unchanged — the extra pair ops exist only in this variant.
    `potential_only` (requires `with_potential`): skip the force channels
    entirely -> (u, dropped_pairs) — ~2x fewer pair ops; the diagnostics
    gauge uses it when the run's own accel is supplied for the half-kick.
    Same pair list and accumulation order as the fused variant: the
    Pallas sweep's au chain is literally unchanged (bitwise-equal u);
    the XLA fallback matches to fusion-level rounding (~1 ULP — dropping
    the force channels changes one contraction decision).
    `half_pairs` (requires `potential_only`): Newton-3rd halved pair
    enumeration — the potential is symmetric (u_ij = u_ji), and the
    gauge only consumes the TOTAL 0.5*sum(u), so each unordered block
    pair is listed once (j >= i at sweep granularity; diagonal pairs
    weighted 1/2 in the sweep) for ~2x fewer pair interactions. The
    returned u is rescaled by 2 so `0.5*sum(u)` still equals the total;
    PER-PARTICLE entries are no longer physical (cross-block
    contributions land only on the lower block's side) and the total
    matches the directed enumeration to f32 accumulation-order rounding,
    not bitwise. Budgets (`pair_budget`, `sub_pair_budget`) keep their
    probed full-directed-count semantics; the halved requirement
    (F + diag)/2 is derived internally.
    `total_only` (requires `potential_only`): return the SCALAR sum of
    the per-particle potentials -> (u_total, dropped_pairs), skipping
    the un-sort payload sort (the gauge consumes only the total; the
    gated block-order sum equals the particle-order sum up to f32
    reassociation). Owner-masked mesh partials still psum-compose.
    `half_force` (force trace only; round 5): Newton-3rd HALVED force
    sweep — each unordered block pair's [B, B] plane is computed once
    and applied to both sides (`_sweep_kernel_n3`, the ops/allpairs.py
    banded half-pair structure). Exact same pair set; accumulation
    order differs from the directed sweep (f32 ulp-class trajectory
    divergence, like `-halfpair`). Auto-falls-back to the directed
    sweep when its static gate fails: XLA backend, sub-block-expanded
    scenes (block > sweep width), pair lists past one SMEM slice, or
    owner-masked mesh runs (the j-side crosses ownership).
    """
    if potential_only and not with_potential:
        raise ValueError("potential_only requires with_potential=True")
    if half_pairs and not potential_only:
        raise ValueError("half_pairs requires potential_only=True")
    if total_only and not potential_only:
        raise ValueError("total_only requires potential_only=True")
    if half_force and with_potential:
        raise ValueError("half_force is a force-trace option "
                         "(with_potential computes its own channels)")
    n = position.shape[1]
    if block is None:
        block = default_block(n)
    if pair_chunk is None:
        pair_chunk = max(8, 64 * (256 * 256) // (block * block))
    gn = near_grid
    hn = box / gn
    sigma = r_c * _SIGMA_PER_CUTOFF
    bits = max((gn - 1).bit_length(), 1)
    if 3 * bits + 1 > 31:
        raise ValueError(f"near grid {gn} overflows the int32 Morton code")

    u = position[:3] / jnp.float32(hn) + jnp.float32(gn / 2)
    ib = jnp.floor(u).astype(jnp.int32)
    inbox = jnp.all((ib >= 0) & (ib <= gn - 1), axis=0)
    code = _morton(jnp.clip(ib, 0, gn - 1), bits)
    sentinel = jnp.int32(1 << (3 * bits))
    code = jnp.where(inbox, code, sentinel)  # out-of-box: no near force
    pid = jnp.arange(n, dtype=jnp.int32)
    scode, sx, sy, sz, spid = jax.lax.sort(
        (code, position[0], position[1], position[2], pid),
        dimension=0, num_keys=1, is_stable=False,
    )

    nb = -(-n // block)
    npad = nb * block - n
    if npad:
        scode = jnp.concatenate(
            [scode, jnp.full((npad,), sentinel, jnp.int32)]
        )
        sx = jnp.concatenate([sx, jnp.full((npad,), _PARK)])
        sy = jnp.concatenate([sy, jnp.full((npad,), _PARK)])
        sz = jnp.concatenate([sz, jnp.full((npad,), _PARK)])
        spid = jnp.concatenate(
            [spid, jnp.arange(n, n + npad, dtype=jnp.int32)]
        )

    # Park out-of-box particles (sentinel code): the no-near-force contract
    # of the slot sweep — they must neither feel nor exert short-range
    # force even when they share a boundary block with live particles.
    live_flat = scode < sentinel
    sx = jnp.where(live_flat, sx, _PARK)
    sy = jnp.where(live_flat, sy, _PARK)
    sz = jnp.where(live_flat, sz, _PARK)

    # -- node AABBs (float coords, live-masked) -------------------------------
    live = live_flat.reshape(nb, block)
    any_live = jnp.any(live, axis=1)
    fmin, fmax = [], []
    for s in (sx, sy, sz):
        sb = s.reshape(nb, block)
        fmin.append(jnp.min(jnp.where(live, sb, jnp.float32(4e9)), axis=1))
        fmax.append(jnp.max(jnp.where(live, sb, jnp.float32(-4e9)), axis=1))

    # -- dual-tree walk, flattened: AABB distance -> compacted pair list ----
    # The short-range factor is EXACTLY zero at separations > r_c
    # (`short_factor_cheb` clamps beyond _TC*sigma = r_c), so pruning
    # block pairs whose AABB min distance exceeds r_c is EXACT — and
    # strictly tighter than cell-granularity 27-adjacency, which keeps
    # diagonal cell neighbors with a real gap > r_c and same-cell pairs
    # of tiny far-apart Morton blocks (clustered scenes).
    m = any_live[:, None] & any_live[None, :]
    gap2 = jnp.zeros((nb, nb), jnp.float32)
    for c in range(3):
        g = jnp.maximum(
            jnp.maximum(
                fmin[c][:, None] - fmax[c][None, :],
                fmin[c][None, :] - fmax[c][:, None],
            ),
            0.0,
        )
        gap2 = gap2 + g * g
    m = m & (gap2 <= jnp.float32(r_c) * jnp.float32(r_c))

    from multi_adapter_particles_tpu.ops.dispatch import pallas_supported

    # Newton-3rd force sweep gate — fully STATIC so the halving below
    # and the kernel choice always agree: Pallas only (the XLA fallback
    # has no banded accumulator), native sweep width (no sub-block
    # expansion), single SMEM slice for the halved list, single device
    # (the j-side crosses target ownership).
    use_n3 = (
        bool(half_force)
        and pallas_supported()
        and block <= _SWEEP_MAX_BLOCK
        and block_owner_fn is None
        and -(-nb // _n3_kb(nb, block)) <= _N3_MAX_BANDS
    )
    if use_n3:
        p_full = int(min(pair_budget or default_pair_budget(nb), nb * nb))
        cap_n3 = sweep_slice_cap
        if cap_n3 is None:
            cap_n3 = 2 * ((768 * 1024) // 4 - (nb + 1))
        if min((p_full + nb) // 2 + 1, nb * nb) > cap_n3:
            use_n3 = False

    if half_pairs or use_n3:
        # keep j >= i: each unordered block pair listed once (adjacency
        # is symmetric); the diagonal survives and is weighted 1/2 where
        # it is swept (potential) / lane-summed once (force — its dense
        # plane already holds both in-block orderings). total/dropped
        # below consistently count the halved list.
        bi = jnp.arange(nb, dtype=jnp.int32)
        m = m & (bi[None, :] >= bi[:, None])
    flat = m.reshape(nb * nb)
    total = jnp.sum(flat.astype(jnp.int32))
    p_max = pair_budget or default_pair_budget(nb)
    p_max = int(min(p_max, nb * nb))
    if half_pairs or use_n3:
        # budgets are probed on the full directed list (host_pair_budget);
        # the halved list holds (F + D)/2 <= (F + nb)/2 live pairs
        # (D = live diagonal pairs)
        p_max = min((p_max + nb) // 2 + 1, nb * nb)
    pc = int(min(pair_chunk, p_max))
    p_max = max(pc, (p_max // pc) * pc)  # pc | p_max and p_max <= nb*nb

    inv = (~flat).astype(jnp.int32)
    idx = jnp.arange(nb * nb, dtype=jnp.int32)
    skey, sidx = jax.lax.sort((inv, idx), dimension=0, num_keys=1,
                              is_stable=True)
    sidx = sidx[:p_max]                       # i-major (stable sort on iota)
    i_idx = sidx // nb
    j_idx = sidx % nb
    live_pair = skey[:p_max] == 0
    if block_owner_fn is not None:
        live_pair = live_pair & block_owner_fn(i_idx)
    valid = live_pair.astype(jnp.float32)
    dropped = jnp.maximum(total - p_max, 0)

    # -- direct interactions over the listed pairs ----------------------------
    from multi_adapter_particles_tpu.ops.dispatch import pallas_supported

    # The sweep kernel prefetches bounds [nb+1] + uint16-packed j_idx
    # [p_max/2 words] into SMEM (1 MiB/core on v5e; measured overflow at
    # 1.05 MB of prefetched scalars). Pair lists past the SMEM roof
    # (~380K pairs post-packing) run as MULTIPLE kernel invocations over
    # consecutive slices of the i-major list — per-target bounds clamped
    # to each slice, partial accelerations summed (exact by linearity of
    # the pair sum; a target block straddling a slice boundary simply
    # accumulates from both invocations).
    if pallas_supported():
        # VMEM sweep kernel: per target block, its neighbor sources stream
        # HBM->VMEM through a double-buffered DMA pipeline (the
        # ops/allpairs.py structure driven by the prefetched pair list).
        # Per-target accumulation happens in registers — no [P, B, 3]
        # materialization, no segment sum.
        #
        # Blocks wider than _SWEEP_MAX_BLOCK (the adjacency walk caps NB
        # at ~2048, so multi-million-N scenes get block >= 1024 whose
        # [B, B] pair planes would blow VMEM) are SPLIT for the sweep
        # only: each listed block pair expands to split² sub-block pairs
        # — exact by linearity of the pair sum — re-sorted i-major, and
        # swept at sub-block width. One ~(split²·P)-entry sort; the pair
        # interaction count is unchanged.
        sweep_block, sweep_nb = block, nb
        sweep_i = jnp.where(live_pair, i_idx, nb)  # ascending
        sweep_j = j_idx
        if use_n3:
            acc_b = _near_sweep_pallas_n3(
                sx, sy, sz, sweep_i, sweep_j, nb=nb, block=block,
                eps2=eps2, sigma=float(sigma),
            )
        if (not use_n3) and block > _SWEEP_MAX_BLOCK:
            split = block // _SWEEP_MAX_BLOCK
            sweep_block = _SWEEP_MAX_BLOCK
            sweep_nb = nb * split
            if sweep_nb >= 1 << 16:
                raise ValueError(
                    f"sub-block expansion needs {sweep_nb} block ids; the "
                    "uint16-packed pair list caps at 65535"
                )
            a_off = jnp.arange(split, dtype=jnp.int32)
            i_s = jnp.where(
                live_pair[:, None],
                i_idx[:, None] * split + a_off[None, :],
                sweep_nb,
            )                                              # [P, split]
            j_s = j_idx[:, None] * split + a_off[None, :]  # [P, split]
            shape = (p_max, split, split)
            i_e = jnp.broadcast_to(i_s[:, :, None], shape).reshape(-1)
            j_e = jnp.broadcast_to(j_s[:, None, :], shape).reshape(-1)
            # sub-block AABB pruning — the exact r_c rule at sub-block
            # granularity. A wide block pair is usually adjacent through
            # a small face region, so most of its split² sub-pairs have a
            # real gap > r_c: sentinel them out and the bounds walk skips
            # them (the list length is unchanged; the SWEPT work shrinks
            # to the surviving pairs).
            slive = live_flat.reshape(sweep_nb, sweep_block)
            smin, smax = [], []
            for s in (sx, sy, sz):
                sb = s.reshape(sweep_nb, sweep_block)
                smin.append(jnp.min(
                    jnp.where(slive, sb, jnp.float32(4e9)), axis=1))
                smax.append(jnp.max(
                    jnp.where(slive, sb, jnp.float32(-4e9)), axis=1))
            ic = jnp.minimum(i_e, sweep_nb - 1)
            gap2_e = jnp.zeros(i_e.shape, jnp.float32)
            for c in range(3):
                g = jnp.maximum(
                    jnp.maximum(
                        smin[c][ic] - smax[c][j_e],
                        smin[c][j_e] - smax[c][ic],
                    ),
                    0.0,
                )
                gap2_e = gap2_e + g * g
            near_e = gap2_e <= jnp.float32(r_c) * jnp.float32(r_c)
            if half_pairs:
                # a parent diagonal pair expands to BOTH sub orderings —
                # keep one (j >= i at sweep granularity; sub-diagonals
                # stay and are weighted 1/2 in-kernel). Parent i < j
                # pairs always satisfy j_e > i_e, so this only prunes
                # inside diagonals.
                near_e = near_e & (j_e >= i_e)
            i_e = jnp.where(near_e, i_e, sweep_nb)
            sweep_i, sweep_j = jax.lax.sort(
                (i_e, j_e), dimension=0, num_keys=1, is_stable=True
            )
            if sub_pair_budget is not None:
                # host-probed survivor count: truncating the sorted list
                # to it drops only sentinel tail entries in the expected
                # case (fewer SMEM slices at 16.8M-class N); if the scene
                # outgrew the probe, the shortfall is counted in
                # dropped_pairs like any other truncation
                keep = max(2, sub_pair_budget)
                if half_pairs:
                    # the budget is probed at full directed sub
                    # granularity; halved survivors are
                    # (S + D_sub)/2 <= (S + sweep_nb)/2. Halve the
                    # BUDGET before clamping to the (already-halved)
                    # list length — clamping first would halve twice.
                    keep = (keep + sweep_nb) // 2 + 2
                keep = int(min(i_e.shape[0], keep))
                if block_owner_fn is None:
                    live_e = jnp.sum((sweep_i < sweep_nb).astype(jnp.int32))
                else:
                    # GLOBAL survivor recount — the contract above says
                    # dropped_pairs is identical on every device, but
                    # sweep_i is owner-masked here, so its live count is
                    # per-device. Ownership only parks entries at the
                    # sentinel; redoing the sub-AABB test on the
                    # un-owner-masked list gives the same count every
                    # device computes — and the budget itself is sized
                    # from the global scene (host_sub_pair_budget), so
                    # the global count is the consistent
                    # outgrew-the-probe signal.
                    i_gs = jnp.where(
                        (skey[:p_max] == 0)[:, None],
                        i_idx[:, None] * split + a_off[None, :],
                        sweep_nb,
                    )
                    i_ge = jnp.broadcast_to(
                        i_gs[:, :, None], shape
                    ).reshape(-1)
                    icg = jnp.minimum(i_ge, sweep_nb - 1)
                    gap2_g = jnp.zeros(i_ge.shape, jnp.float32)
                    for c in range(3):
                        g = jnp.maximum(
                            jnp.maximum(
                                smin[c][icg] - smax[c][j_e],
                                smin[c][j_e] - smax[c][icg],
                            ),
                            0.0,
                        )
                        gap2_g = gap2_g + g * g
                    live_g = (
                        gap2_g <= jnp.float32(r_c) * jnp.float32(r_c)
                    ) & (i_ge < sweep_nb)
                    if half_pairs:
                        live_g = live_g & (j_e >= i_ge)
                    live_e = jnp.sum(live_g.astype(jnp.int32))
                dropped = dropped + jnp.maximum(
                    live_e - keep, 0
                )
                sweep_i = sweep_i[:keep]
                sweep_j = sweep_j[:keep]
        if sweep_slice_cap is None:
            # the kernel prefetches bounds [sweep_nb+1] + the packed pair
            # list into SMEM — budget AFTER sweep_nb is known (expansion
            # grows it split-fold; budgeting nb+1 here overflowed SMEM at
            # 16.8M where bounds alone is 32769 words)
            smem_words = (768 * 1024) // 4
            sweep_slice_cap = 2 * (smem_words - (sweep_nb + 1))
        sweep_slice_cap = max(2, sweep_slice_cap // 2 * 2)  # even: u16 pack
        p_sweep = int(sweep_j.shape[0])
        bounds = pm._segment_bounds(sweep_i, sweep_nb)     # [sweep_nb+1]
        if use_n3:
            pass  # acc_b computed by _near_sweep_pallas_n3 above
        elif p_sweep <= sweep_slice_cap:
            acc_b = _near_sweep_pallas(
                sx, sy, sz, bounds, sweep_j, nb=sweep_nb, block=sweep_block,
                eps2=eps2, sigma=float(sigma), with_potential=with_potential,
                potential_only=potential_only, half_pairs=half_pairs,
            )
        else:
            acc_b = jnp.zeros((4, nb * block), jnp.float32)
            for lo in range(0, p_sweep, sweep_slice_cap):
                hi = min(lo + sweep_slice_cap, p_sweep)
                acc_b = acc_b + _near_sweep_pallas(
                    sx, sy, sz,
                    jnp.clip(bounds, lo, hi) - jnp.int32(lo),
                    sweep_j[lo:hi], nb=sweep_nb, block=sweep_block,
                    eps2=eps2, sigma=float(sigma),
                    with_potential=with_potential,
                    potential_only=potential_only, half_pairs=half_pairs,
                )
        acc_x, acc_y, acc_z, acc_u = acc_b[0], acc_b[1], acc_b[2], acc_b[3]
    else:
        bx = sx.reshape(nb, block)
        by = sy.reshape(nb, block)
        bz = sz.reshape(nb, block)
        n_chunks = p_max // pc
        if potential_only:
            nch = 1
        else:
            nch = 4 if with_potential else 3
        if half_pairs:
            # diagonal block pairs keep both in-block orderings (plus the
            # self pairs) in their [B, B] plane — weight them 1/2 (the
            # fallback has no sub-block expansion, so sweep granularity
            # is block granularity here)
            valid = valid * jnp.where(
                j_idx == i_idx, jnp.float32(0.5), jnp.float32(1.0)
            )

        def chunk_body(args):
            ii, jj, vv = args                     # each [pc]
            xi, yi, zi = bx[ii], by[ii], bz[ii]   # [pc, B] wide-row gathers
            xj, yj, zj = bx[jj], by[jj], bz[jj]
            dxv = xj[:, None, :] - xi[:, :, None]  # [pc, B, B] src on lanes
            dyv = yj[:, None, :] - yi[:, :, None]
            dzv = zj[:, None, :] - zi[:, :, None]
            d2 = dxv * dxv + dyv * dyv + dzv * dzv
            parts = []
            if not potential_only:
                # Chebyshev factor: ~2x fewer ops than the erf form, 5.5e-6
                # of exact everywhere (the f32 erf form itself loses 45% at
                # r<0.01 to cancellation — see short_factor_cheb)
                s = short_factor_cheb(d2, eps2, sigma) * vv[:, None, None]
                parts = [
                    jnp.sum(s * dxv, axis=-1),
                    jnp.sum(s * dyv, axis=-1),
                    jnp.sum(s * dzv, axis=-1),
                ]
            if with_potential:
                u = short_potential_cheb(d2, eps2, sigma)
                parts.append(jnp.sum(u * vv[:, None, None], axis=-1))
            return jnp.stack(parts, axis=-1)      # [pc, B, nch]

        # scan accumulates chunk results straight into the per-target
        # buffer — the stacked [P, B, 3] of a lax.map would be gigabytes
        # at multi-million N (and pads its trailing 3 to a full lane tile)
        def chunk_step(acc, args):
            ii = args[0]
            f = chunk_body(args).reshape(pc, block * nch)
            return (
                acc
                + jax.ops.segment_sum(
                    f, ii, num_segments=nb, indices_are_sorted=True
                ),
                None,
            )

        # seed the carry from varying data (0*sx[0]) so its manual-axes
        # type matches the body output under shard_map (scan rejects an
        # unvarying init against a mesh-varying carry)
        acc_b, _ = jax.lax.scan(
            chunk_step,
            jnp.zeros((nb, block * nch), jnp.float32) + 0.0 * sx[0],
            (
                i_idx.reshape(n_chunks, pc),
                j_idx.reshape(n_chunks, pc),
                valid.reshape(n_chunks, pc),
            ),
        )
        acc_b = acc_b.reshape(nb * block, nch)
        if potential_only:
            acc_u = acc_b[:, 0]
            acc_x = acc_y = acc_z = None
        else:
            acc_x, acc_y, acc_z = acc_b[:, 0], acc_b[:, 1], acc_b[:, 2]
            acc_u = acc_b[:, 3] if with_potential else None

    scale = jnp.float32(g_const)
    if not with_potential:
        # -- un-sort to particle order (payload sort, not a scatter) ---------
        _, fx, fy, fz = jax.lax.sort(
            (spid, acc_x, acc_y, acc_z),
            dimension=0, num_keys=1, is_stable=False,
        )
        return jnp.stack([fx[:n], fy[:n], fz[:n]]) * scale, dropped

    # Potential channel: unlike the force (where the self/parked pairs
    # contribute r_vec = 0), u_short(0) is a nonzero constant — every
    # live particle picked it up exactly once (its own block pairs with
    # itself once, in every sweep path), and co-parked particles picked
    # it up per parked neighbor. Subtract the self constant from live
    # (owner-masked) entries and zero everything else, in SORTED order
    # where the live/owner masks are natural.
    gate = live_flat
    if block_owner_fn is not None:
        owner_b = block_owner_fn(jnp.arange(nb, dtype=jnp.int32))
        gate = gate & jnp.repeat(owner_b, block)
    u_self = jnp.float32(short_potential_self(float(eps2), float(sigma)))
    if half_pairs:
        # the halved sweep weights the diagonal block pair 1/2, so each
        # live particle picked up exactly half the self constant
        u_self = u_self * jnp.float32(0.5)
    acc_u = jnp.where(gate, acc_u - u_self, 0.0)
    if potential_only:
        # half mode rescales by 2 so the caller's 0.5*sum(u) contract
        # holds unchanged (each unordered pair was counted once, not
        # twice); per-particle entries are sum-only meaningful there
        u_scale = scale * jnp.float32(2.0) if half_pairs else scale
        if total_only:
            # gated entries are already 0 for parked/non-owned rows, so
            # the block-order sum needs no un-sort
            return jnp.sum(acc_u) * u_scale, dropped
        _, fu = jax.lax.sort(
            (spid, acc_u), dimension=0, num_keys=1, is_stable=False,
        )
        return fu[:n] * u_scale, dropped
    _, fx, fy, fz, fu = jax.lax.sort(
        (spid, acc_x, acc_y, acc_z, acc_u),
        dimension=0, num_keys=1, is_stable=False,
    )
    return jnp.stack([fx[:n], fy[:n], fz[:n]]) * scale, fu[:n] * scale, dropped


# budget headroom over the probed initial-state counts: scenes evolve,
# and a breached budget only costs counted (never silent) dropped pairs
PAIR_HEADROOM = 1.25


def host_pair_budget(
    position,              # array-like [4, N] (host or device)
    box: float,
    r_c: float,
    near_grid: int,
    block: int | None = None,
    headroom: float = PAIR_HEADROOM,
) -> int:
    """NumPy replica of the block-pair count — cheap enough to run once
    at startup so the CLI can size `pair_budget` from the ACTUAL scene
    instead of the density-free default (the demo shell at G=64 needs
    ~210 pairs/block where the default budgets 64; a truncated budget
    silently costs accuracy, counted in `dropped_pairs`)."""
    if block is None:
        count, _, _ = host_tree_counts(position, box, r_c, near_grid)
    else:
        count, _ = host_block_pairs(position, box, r_c, near_grid, block)
    return int(count * headroom) + 1


def host_tree_counts(
    position,
    box: float,
    r_c: float,
    near_grid: int,
    block: int | None = None,
):
    """One Morton sort -> (coarse_count, sub_count_or_None, block).

    The shared probe behind `host_pair_budget`, `host_sub_pair_budget`,
    `host_block_pairs` and `auto_grid` — the ONE host-side copy of the
    device walk's pruning rule (Morton interleave, live-masked float
    AABBs, banded gap² <= r_c² test); keep it bit-faithful to
    `near_field_tree`. Two-level, mirroring the device exactly: coarse
    block pairs under the AABB rule first, then sub-block tests only
    inside the survivors (a sub-pair within r_c implies its parent pair
    is too, so nothing is missed). A flat count at sub granularity was
    ~569 s at 16.8M (32768² tests); this is the same numbers in
    ~1/100th, and auto_grid stops paying two sorts per candidate.
    `block` None = the device default for N (explicit values serve
    `host_block_pairs` callers probing other granularities)."""
    import numpy as np

    pos = np.asarray(position)
    n = pos.shape[1]
    if block is None:
        block = default_block(n)
    split = max(1, block // _SWEEP_MAX_BLOCK)
    sub_block = block // split

    gn = near_grid
    hn = box / gn
    p3 = pos[:3]
    ib = np.floor(p3 / hn + gn / 2).astype(np.int64)
    inbox = ((ib >= 0) & (ib <= gn - 1)).all(axis=0)
    bits = max(int(gn - 1).bit_length(), 1)
    ibc = np.clip(ib, 0, gn - 1)
    code = np.zeros(n, np.int64)
    for b in range(bits):
        for c in range(3):
            code |= ((ibc[c] >> b) & 1) << (3 * b + c)
    code[~inbox] = 1 << (3 * bits)
    order = np.argsort(code, kind="stable")
    spos = p3[:, order].astype(np.float32)
    live = inbox[order]
    nb = -(-n // block)
    pad = nb * block - n
    if pad:
        spos = np.concatenate([spos, np.zeros((3, pad), np.float32)], axis=1)
        live = np.concatenate([live, np.zeros(pad, bool)])
    nbs = nb * split
    sspos = spos.reshape(3, nbs, sub_block)
    slive = live.reshape(nbs, sub_block)
    smin = np.where(slive[None], sspos, 4e9).min(axis=2)    # [3, nbs]
    smax = np.where(slive[None], sspos, -4e9).max(axis=2)
    # coarse AABBs fold the sub ones
    cmin = smin.reshape(3, nb, split).min(axis=2)           # [3, nb]
    cmax = smax.reshape(3, nb, split).max(axis=2)
    c_any = slive.reshape(nb, block).any(axis=1)
    rc2 = np.float32(r_c) ** 2

    def _pairs(fmin, fmax, alive, band=4096):
        nn = fmin.shape[1]
        out = []
        for lo in range(0, nn, band):
            hi = min(lo + band, nn)
            m = alive[lo:hi, None] & alive[None, :]
            gap2 = np.zeros((hi - lo, nn), np.float32)
            for c in range(3):
                g = np.maximum(
                    np.maximum(
                        fmin[c][lo:hi, None] - fmax[c][None, :],
                        fmin[c][None, :] - fmax[c][lo:hi, None],
                    ),
                    0.0,
                )
                gap2 += g * g
            ii, jj = (m & (gap2 <= rc2)).nonzero()
            out.append((ii + lo, jj))
        return (
            np.concatenate([o[0] for o in out]),
            np.concatenate([o[1] for o in out]),
        )

    ci, cj = _pairs(cmin, cmax, c_any)
    coarse = len(ci)
    if split == 1:
        return coarse, None, block
    # sub tests only inside surviving coarse pairs: [P, split, split]
    a = np.arange(split)
    isub = (ci[:, None] * split + a[None, :])[:, :, None]   # [P, split, 1]
    jsub = (cj[:, None] * split + a[None, :])[:, None, :]   # [P, 1, split]
    gap2 = np.zeros((len(ci), split, split), np.float32)
    for c in range(3):
        g = np.maximum(
            np.maximum(
                smin[c][isub] - smax[c][jsub],
                smin[c][jsub] - smax[c][isub],
            ),
            0.0,
        )
        gap2 += g * g
    return coarse, int((gap2 <= rc2).sum()), block


def host_sub_pair_budget(
    position,
    box: float,
    r_c: float,
    near_grid: int,
    headroom: float = PAIR_HEADROOM,
) -> int | None:
    """Survivor count of the sub-block AABB prune (x headroom), for
    `near_field_tree(sub_pair_budget=...)` — None when the scene's
    adaptive block is already sweep-width (no expansion happens)."""
    _, sub, _ = host_tree_counts(position, box, r_c, near_grid)
    if sub is None:
        return None
    return int(sub * headroom) + 2


def host_block_pairs(
    position,
    box: float,
    r_c: float,
    near_grid: int,
    block: int | None = None,
):
    """Host-side block-pair count under the device walk's exact pruning
    rule -> (count, block). The budget and the auto-grid cost model both
    consume this. Delegates to `host_tree_counts` — the one host copy of
    the pruning rule (a second transcription desynchronized from it is
    exactly how a startup probe under-budgets the device sweep)."""
    coarse, _sub, blk = host_tree_counts(
        position, box, r_c, near_grid, block=block
    )
    return coarse, blk


# Auto-grid cost model, calibrated on v5e fp32 (2026-08-17) against the
# measured grid sweeps on the two-cluster demo init at 262K and 1M
# (ROADMAP: "the grid optimum shifts with N"):
#   accel_ms ~= _COST_PER_PAIR * pair_interactions
#             + _COST_FAR * G^3 * log2(G)          (FFT far field + grids)
#             + _COST_PER_N * N                    (sort/adjacency/gathers)
# Least-squares over the 9 measured (N, G) points reproduces each within
# ~16% worst-case (~6% typical; radix-5 G=160 and G=96 under-modeled —
# the ladder below keeps to 2^a*3^b sizes). The measured optima are
# G=128 @262K (G=96 measured 14% slower than G=128 despite a lower
# modeled cost) and G=192 @1M; the band tie-break below recovers both.
# Absolute times are chip-specific; only the RANKING matters and it is
# driven by scene pair count vs the G^3 far field — roughly portable.
_COST_PER_PAIR = 1.374e-8
_COST_FAR = 3.911e-6
_COST_PER_N = 4.316e-5
_COST_BAND = 1.2

AUTO_GRID_LADDER = (64, 96, 128, 192, 256, 384, 512)

# HBM feasibility roof for the long-range solve. The lane-packed corner
# rows (pm._pack_corner_rows) are 128 B/cell — the pre-packing
# [G^3,32]->T(8,128) relayout copy that OOM'd at 29.0 GB (G=384 @4M,
# 2026-08-19 03:29 sweep) no longer exists. Re-measured the SAME config
# with the packed code (2026-08-19 08:19 sweep, /tmp/tree4m_r4.log): the
# binding allocation is now the DOUBLED-GRID FFT working set — the AOT
# compile peaks at 19.21 GiB of HLO temps, ~10 simultaneously-live
# (2G)^3-float buffers (pruned-rfft intermediates, f32[768,768,128,6] =
# 768^3 each, incl. remat copies), i.e. ~364 B per G-cell — vs 15.75 GiB
# usable v5e HBM. G=256 (same model ~6 GiB) compiles and runs at
# 3495.9 ms/accel @4M (was 4081.5 pre-packing); G=192 measured 4411.4 ms,
# so the admitted optimum already beats the modeled ~3.6 s at G=384.
# Sequentializing the per-component FFT solves is the lever if 384 is
# ever needed.
_SOLVE_BYTES_PER_CELL = 364
DEFAULT_HBM_SOLVE_BUDGET = 14 * 1024**3
# back-compat alias (round-3 name; same roof, repriced)
DEFAULT_HBM_ROW_BUDGET = DEFAULT_HBM_SOLVE_BUDGET


def feasible_grid(g: int, hbm_budget: int = DEFAULT_HBM_SOLVE_BUDGET
                  ) -> bool:
    """Whether grid g's long-range FFT solve fits the HBM budget."""
    return g ** 3 * _SOLVE_BYTES_PER_CELL <= hbm_budget


def counts_cache_key(gn: int, r_c: float):
    """Canonical `counts_cache` key for one (near-grid, cutoff) probe.
    The float goes through one fixed format so lookups are exact across
    processes (utils/probecache.py persists these keys as JSON)."""
    return (int(gn), f"{float(r_c):.9g}")


def auto_grid(
    position,
    box: float,
    cutoff_cells: float,
    candidates=AUTO_GRID_LADDER,
    counts_cache: dict | None = None,
    num_particles: int | None = None,
) -> int:
    """Pick the mesh size minimizing the modeled tree-P3M accel time.

    Probes the ACTUAL scene: per candidate G the host block-pair count
    (the same exact pruning rule the device walk uses) prices the near
    sweep, against the G^3 log G far field. The optimum shifts with the
    scene and N — measured 128 @262K but 192 @1M on the demo init — so a
    fixed default is wrong somewhere; this replaces it with the measured
    cost model above.

    Tie-break: among candidates within _COST_BAND of the minimum modeled
    cost, take the LARGEST grid. Within model noise the larger grid is
    the safer bet — its cost is dominated by the exactly-known far-field
    term, while the pair term can only grow as the scene clusters over
    time; the rule also matches the measured 262K call (96 vs 128 model
    costs within 8%, 128 measured 14% faster).

    `counts_cache`: optional dict of `counts_cache_key(gn, r_c)` ->
    `host_tree_counts` triple — probes hit the cache and misses fill it
    (a 4M probe is ~15-25 s; utils/probecache.py persists the dict
    across launches). `position` may then be a ZERO-ARG CALLABLE,
    materialized only on a cache miss (skips the 4M device init + host
    copy on a warm cache) — pass `num_particles` alongside so the
    ladder trimming needn't touch it either.
    """
    import numpy as np

    if callable(position):
        pos_fn, _pos = position, None

        def get_pos():
            nonlocal _pos
            if _pos is None:
                _pos = np.asarray(pos_fn())
            return _pos
    else:
        def get_pos():
            return position

    n = num_particles
    if n is None:
        n = np.asarray(get_pos()).shape[1]
    is_default = candidates is AUTO_GRID_LADDER
    candidates = tuple(g for g in candidates if feasible_grid(g))
    if not candidates:
        raise ValueError(
            "no auto_grid candidate fits the HBM solve budget "
            f"({DEFAULT_HBM_SOLVE_BUDGET} B); largest feasible grid is "
            f"{int((DEFAULT_HBM_SOLVE_BUDGET / _SOLVE_BYTES_PER_CELL) ** (1 / 3))}"
        )
    if is_default:
        # probe cost is ~15-25 s per candidate at 4M (a fresh Morton
        # sort + banded AABB count each); small grids are strictly
        # dominated at scale (measured/modeled: G<=128 @4M >= 3x the
        # optimum, @16.8M >= 10x) — trim them instead of pricing them
        if n > 8_000_000:
            candidates = tuple(g for g in candidates if g >= 256)
        elif n > 2_000_000:
            candidates = tuple(g for g in candidates if g >= 192)
    costs = {}
    for g in candidates:
        r_c = cutoff_cells * box / g
        gn = max(int(box // r_c), 1)
        ck = counts_cache_key(gn, r_c)
        if counts_cache is not None and ck in counts_cache:
            coarse, sub, block = counts_cache[ck]
        else:
            coarse, sub, block = host_tree_counts(get_pos(), box, r_c, gn)
            if counts_cache is not None:
                counts_cache[ck] = (coarse, sub, block)
        if sub is not None:
            # wide blocks are swept at sub-block granularity with the same
            # AABB rule (sub-block expansion + pruning), so the SWEPT work
            # is the sub-granularity pair count — the coarse count would
            # overprice the near field by ~split² on diffuse scenes
            count, block = sub, _SWEEP_MAX_BLOCK
        else:
            count = coarse
        pairs = float(count) * block * block
        costs[g] = (
            _COST_PER_PAIR * pairs
            + _COST_FAR * g ** 3 * np.log2(g)
            + _COST_PER_N * n
        )
    cmin = min(costs.values())
    return int(max(g for g, c in costs.items() if c <= _COST_BAND * cmin))
