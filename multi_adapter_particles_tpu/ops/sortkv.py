"""Stable multi-operand sort as a VMEM-resident bitonic network.

XLA's variadic TPU sort is HBM-pass-bound: every one of the ~log²E
comparator stages round-trips all operands through HBM (measured
@E=2^20: key+3 f32 payloads = 9.7-11.8 ms — experiments/sort_cost.py).
Batcher's bitonic network, however, is mostly LOCAL: all exchange
distances below a VMEM-block size can run entirely on-chip. This module
splits the network accordingly:

- phase A: one `pallas_call` sorts each 2^bl-entry block fully in VMEM
  (the complete k=2..B phase cascade, 153 sub-stages at B=2^17, with the
  k=B direction taken from the GLOBAL index — odd blocks sort that phase
  descending, exactly the Batcher rule);
- phase B: for each merge length k=2B..E, the few exchanges with
  distance >= B are single XLA element-wise passes (reshape + compare +
  select — ~0.2 ms each, 6 total at E=2^20/B=2^17), and the 17
  below-block distances collapse into ONE VMEM kernel pass per round.

Stability: bitonic networks are not stable, so the ORIGINAL index rides
as an explicit operand and every comparator is lexicographic on
(key, idx) — a strict total order, which makes the network's output
exactly the stable sort. Lane-distance exchanges (< 128) use
`pltpu.roll`; sublane distances use a size-2 axis flip; block distances
are the XLA passes.

Layout: entry i lives at [i // 128, i % 128] of an [R, 128] tile — the
natural (sublane, lane) order, so every distance >= 128 is a sublane/row
exchange and only 7 distances (1..64) touch lanes.

E must be a power of two with E >= 2^bl (the renderer's entry counts,
N-padded * dup, are; general callers pad with key = INT32_MAX).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multi_adapter_particles_tpu.ops.dispatch import interpret_flag

_I32_MAX = 2147483647


def _substage(vals, j: int, asc, r: int):
    """One compare-exchange distance `j` on a list of [R, 128] arrays.

    vals[0] = key, vals[1] = idx (the lexicographic tie-break); `asc` is
    the per-element ascending mask ([R, 1] or [1, 128] or scalar bool).
    """
    if j >= 128:
        jr = j // 128

        def partner(x):
            xr = x.reshape(r // (2 * jr), 2, jr, 128)
            return jnp.concatenate(
                [xr[:, 1:2], xr[:, 0:1]], axis=1
            ).reshape(r, 128)

        row = jax.lax.broadcasted_iota(jnp.int32, (r, 1), 0)
        lower = (row & jr) == 0
    else:

        def partner(x):
            # roll shifts must be non-negative: -j mod 128
            return jnp.where(
                lane_lower,
                pltpu.roll(x, 128 - j, axis=1),
                pltpu.roll(x, j, axis=1),
            )

        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        lane_lower = (lane & j) == 0
        lower = lane_lower

    parts = [partner(v) for v in vals]
    k, kp = vals[0], parts[0]
    i, ip = vals[1], parts[1]
    k_lo = jnp.where(lower, k, kp)
    k_hi = jnp.where(lower, kp, k)
    i_lo = jnp.where(lower, i, ip)
    i_hi = jnp.where(lower, ip, i)
    # strict total order on (key, idx): equality is impossible, so the
    # descending comparator is simply the negation. Arithmetic 0/1 masks
    # instead of boolean vectors: Mosaic on this toolchain rejects full-
    # shape i8->i1 truncations (bool selects on [R, 128] operands).
    gt = (
        (k_lo > k_hi).astype(jnp.int32)
        | ((k_lo == k_hi) & (i_lo > i_hi)).astype(jnp.int32)
    )
    asc_i = jnp.asarray(asc).astype(jnp.int32)
    swap = asc_i * gt + (1 - asc_i) * (1 - gt)
    return [jnp.where(swap > 0, p, v) for v, p in zip(vals, parts)]


def _asc_mask(k: int, block: int, r: int, pid):
    """Ascending mask for phase k: (global_i & k) == 0.

    k < block: a bit of the in-block index (row or lane plane);
    k >= block: a bit of the block id (scalar per block)."""
    if k < 128:
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        return (lane & k) == 0
    if k < block:
        row = jax.lax.broadcasted_iota(jnp.int32, (r, 1), 0)
        return (row & (k // 128)) == 0
    return ((pid * (block // 128)) & (k // 128)) == 0  # scalar bool


def _make_kernel(n_ops: int, block: int, phase_ks, finish_k):
    """Kernel running, for each k in phase_ks, sub-stages j=k/2..1 — or,
    when finish_k is set, only the below-block tail of that merge."""
    r = block // 128

    def kernel(*refs):
        ins = refs[:n_ops]
        outs = refs[n_ops:]
        pid = pl.program_id(0)
        vals = [ref[:] for ref in ins]
        if finish_k is not None:
            asc = _asc_mask(finish_k, block, r, pid)
            j = block // 2
            while j >= 1:
                vals = _substage(vals, j, asc, r)
                j //= 2
        else:
            for k in phase_ks:
                asc = _asc_mask(k, block, r, pid)
                j = k // 2
                while j >= 1:
                    vals = _substage(vals, j, asc, r)
                    j //= 2
        for o, v in zip(outs, vals):
            o[:] = v

    return kernel


def _vmem_pass(arrs, block: int, phase_ks=None, finish_k=None):
    e = arrs[0].shape[0]
    nb = e // block
    r = block // 128
    n_ops = len(arrs)
    kernel = _make_kernel(n_ops, block, tuple(phase_ks or ()), finish_k)
    tiled = [a.reshape(nb * r, 128) for a in arrs]
    spec = pl.BlockSpec((r, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[spec] * n_ops,
        out_specs=[spec] * n_ops,
        out_shape=[
            jax.ShapeDtypeStruct((nb * r, 128), a.dtype) for a in arrs
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret_flag(),
    )(*tiled)
    return [o.reshape(e) for o in out]


def _cross_stage(arrs, k: int, j: int):
    """One global compare-exchange (distance j >= block) in plain XLA."""
    e = arrs[0].shape[0]
    v = [a.reshape(e // (2 * j), 2, j) for a in arrs]
    lo = [x[:, 0] for x in v]
    hi = [x[:, 1] for x in v]
    g = jnp.arange(e // (2 * j), dtype=jnp.int32) * (2 * j)
    asc = ((g & k) == 0)[:, None]
    gt = (lo[0] > hi[0]) | ((lo[0] == hi[0]) & (lo[1] > hi[1]))
    swap = jnp.where(asc, gt, ~gt)
    out = []
    for x_lo, x_hi in zip(lo, hi):
        nl = jnp.where(swap, x_hi, x_lo)
        nh = jnp.where(swap, x_lo, x_hi)
        out.append(jnp.stack([nl, nh], axis=1).reshape(e))
    return out


@functools.partial(jax.jit, static_argnames=("block_log2",))
def sort_kv_stable(key: jax.Array, *payloads: jax.Array,
                   block_log2: int = 17):
    """Stable ascending sort of (i32 key, f32/i32 payloads...).

    Returns (sorted_key, *sorted_payloads) — bit-identical to
    `jax.lax.sort((key, iota, *payloads), num_keys=1, is_stable=True)`
    minus the iota. E = len(key) must be a power of two; block_log2 caps
    the VMEM block (it is clamped to E)."""
    e = key.shape[0]
    if e & (e - 1):
        raise ValueError(f"E={e} must be a power of two (pad the entries)")
    block = min(1 << block_log2, e)
    idx = jax.lax.iota(jnp.int32, e)
    arrs = [key, idx, *payloads]

    # phase A: full local sorts (k = 2 .. block)
    ks = []
    k = 2
    while k <= block:
        ks.append(k)
        k *= 2
    arrs = _vmem_pass(arrs, block, phase_ks=ks)

    # phase B: merge rounds k = 2*block .. e
    k = 2 * block
    while k <= e:
        j = k // 2
        while j >= block:
            arrs = _cross_stage(arrs, k, j)
            j //= 2
        arrs = _vmem_pass(arrs, block, finish_k=k)
        k *= 2
    skey, _, *spay = arrs
    return (skey, *spay)
