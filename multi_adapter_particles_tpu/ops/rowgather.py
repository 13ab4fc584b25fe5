"""Lane-packed random row gather: the fast way to gather narrow rows.

XLA's TPU gather moves one row per issue regardless of how few lanes the
row fills, so gathering [N] random rows from a [R, W] table with W < 128
wastes most of the 128-lane vector unit AND pays the full per-row issue
latency. Measured on one v5e (4M random rows, [2M, 32] fp32 table):

    plain table[idx]                       160 ms   (38 ns/row)
    pack 4 rows/128 lanes + select          60 ms   (14 ns/row)  2.7x

even though the packed form reads 4x the bytes per row — the gather is
issue-bound, not bandwidth-bound, and a 128-lane row costs the same
issue as a 32-lane one. A hand-rolled Pallas DMA pipeline was also
measured and REJECTED (46 ns/row: per-copy scalar issue cost exceeds
XLA's native gather; see experiments/rowgather_pallas.py).

`gather_rows` packs P = 128//W table rows per 128-lane line, gathers
line idx//P, and selects sub-row idx%P with a compare/select chain
(selects, not one-hot multiplies, so non-finite payloads in unselected
rows cannot poison the result). Bitwise identical to `table[idx]`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


_MAX_LINE_BYTES = 1 << 31  # cap the materialized [N, 128] gather at 2 GiB


def gather_rows(table: jax.Array, idx: jax.Array,
                packed_w: int | None = None) -> jax.Array:
    """table [R, W], idx [N] int -> [N, W]; bitwise == table[idx].

    Packs narrow rows into 128-lane lines when profitable (W < 128 and
    W | 128); otherwise falls back to the plain gather. Very large N
    chunk through `lax.map` so the widened [N, 128] intermediate stays
    bounded (at 16.8M rows it would otherwise be 8.6 GB — measured OOM
    on a 16 GB v5e inside the PM step).

    `packed_w=w`: the table is ALREADY lane-packed — [R/P, P*w] lines of
    P = 128//w logical rows each (e.g. pm._pack_corner_rows output,
    which never materializes the 4x-lane-padded [R, w] form). idx still
    addresses logical rows."""
    if packed_w is not None:
        w = packed_w
        p = 128 // w
        if table.shape[1] != p * w:
            raise ValueError(
                f"packed table width {table.shape[1]} != {p}*{w}"
            )
        packed = table
    else:
        r, w = table.shape
        if w >= 128 or 128 % w != 0:
            return table[idx]
        p = 128 // w
        rp = -(-r // p)
        pad = rp * p - r
        if pad:
            table = jnp.concatenate(
                [table, jnp.zeros((pad, w), table.dtype)], axis=0
            )
        packed = table.reshape(rp, p * w)

    def _do(ci):
        rows = packed[ci // p].reshape(ci.shape[0], p, w)  # ONE wide gather
        sub = (ci % p).astype(jnp.int32)[:, None]
        out = rows[:, 0]
        for c in range(1, p):
            out = jnp.where(sub == c, rows[:, c], out)
        return out

    n = idx.shape[0]
    line_bytes = 128 * table.dtype.itemsize
    if n * line_bytes <= _MAX_LINE_BYTES:
        return _do(idx)
    chunk = _MAX_LINE_BYTES // line_bytes
    k = -(-n // chunk)
    idx_pad = jnp.concatenate(
        [idx, jnp.zeros(k * chunk - n, idx.dtype)]
    ) if k * chunk != n else idx
    out = jax.lax.map(_do, idx_pad.reshape(k, chunk))
    return out.reshape(k * chunk, w)[:n]
