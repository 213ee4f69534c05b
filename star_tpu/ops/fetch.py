"""Aligned-row table fetch — the random-access primitive of the device path.

XLA lowers a large-table gather to a serial per-row loop (measured ~2.6us per
random 128B row on v5e), which left the round-1 MMP kernel latency-bound at
~10K probes/s.  On TPU this module instead issues one aligned async DMA per
row with `blk` copies in flight per grid step (measured ~90ns/row, ~30x
faster), the TPU analog of the reference's random DRAM probes in the suffix-
array bisection (reference: source/SuffixArrayFuns.cpp:133-207).

Semantics: ``fetch_rows(table, byte_off) -> [B, FET] int8`` where row i holds
table bytes ``[align1024(off_i), align1024(off_i) + FET)``.  A negative
offset skips the DMA (row contents unspecified; callers mask those lanes).
Values at byte offset ``off_i`` therefore live at row position
``off_i % TILE`` and, with FET = 2*TILE, up to TILE+FET-TILE-1 further bytes
are guaranteed present — enough for a 1-KB window at any alignment.

On non-TPU backends the same semantics are emulated with a plain XLA gather
so unit tests and the multi-chip CPU dryrun execute the identical algorithm.

Mosaic constraints that shaped this design (discovered in round 1):
  * 1-D int8 HBM slices must have 1024-aligned start and length;
  * dynamic single-row slices of 2-D (tiled) refs are unsupported, so the
    destination is a flat 1-D VMEM block with static per-slot offsets.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 1024      # alignment quantum for HBM int8 slices
FET = 2048       # bytes fetched per row (2 tiles)
BLK = 32         # DMAs in flight per grid step


def pad_table(raw: np.ndarray) -> np.ndarray:
    """pad an int8 byte table so any in-range fetch stays in bounds.
    Padding byte is 5 (the genome spacer char: compares greater than any
    nucleotide, the same convention the host comparator uses past the end)."""
    b = np.ascontiguousarray(raw).view(np.int8).ravel()
    n = ((len(b) + FET + TILE - 1) // TILE) * TILE
    out = np.full(n, 5, dtype=np.int8)
    out[:len(b)] = b
    return out


def _fetch_rows_pallas(table: jax.Array, off: jax.Array) -> jax.Array:
    B = off.shape[0]
    Bp = ((B + BLK - 1) // BLK) * BLK
    if Bp != B:
        off = jnp.concatenate([off, jnp.full(Bp - B, -1, dtype=off.dtype)])

    def kern(off_ref, t_ref, out_ref, sems):
        g = pl.program_id(0)

        def dma(i):
            start = (off_ref[g * BLK + i] // TILE) * TILE
            start = pl.multiple_of(start, TILE)
            return pltpu.make_async_copy(
                t_ref.at[pl.ds(start, FET)],
                out_ref.at[pl.ds(i * FET, FET)],
                sems.at[i])

        for i in range(BLK):
            @pl.when(off_ref[g * BLK + i] >= 0)
            def _(i=i):
                dma(i).start()
        for i in range(BLK):
            @pl.when(off_ref[g * BLK + i] >= 0)
            def _(i=i):
                dma(i).wait()

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Bp // BLK,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((BLK * FET,), lambda i, off: (i,),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA((BLK,))],
    )
    rows = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((Bp * FET,), jnp.int8),
        grid_spec=grid_spec,
    )(off.astype(jnp.int32), table).reshape(Bp, FET)
    return rows[:B]


def _fetch_rows_xla(table: jax.Array, off: jax.Array) -> jax.Array:
    base = jnp.where(off >= 0, (off // TILE) * TILE, 0).astype(jnp.int32)
    idx = base[:, None] + jnp.arange(FET, dtype=jnp.int32)[None, :]
    return jnp.take(table, idx, mode="clip")


# per-call row cap: the prefetched offset array lives in SMEM (1 MB); big
# batches are split into sequential pallas calls
_ROWS_MAX = 1 << 15


def fetch_rows(table: jax.Array, off: jax.Array, *, use_pallas: bool) -> jax.Array:
    """[B] int32 byte offsets -> [B, FET] int8 aligned rows (see module doc)"""
    if not use_pallas:
        return _fetch_rows_xla(table, off)
    B = off.shape[0]
    if B <= _ROWS_MAX:
        return _fetch_rows_pallas(table, off)
    parts = [_fetch_rows_pallas(table, off[i:i + _ROWS_MAX])
             for i in range(0, B, _ROWS_MAX)]
    return jnp.concatenate(parts, axis=0)


def default_use_pallas() -> bool:
    return jax.default_backend() == "tpu"


# ----------------------------------------------------------------- extraction
def extract_i32(rows: jax.Array, rbyte: jax.Array) -> jax.Array:
    """read the little-endian int32 at row byte offset rbyte[i] (< TILE+4)
    from rows[i] without a gather: a windowed one-hot weighted sum.  (A
    bitcast via reshape(B, F/4, 4) would force a lane-dim relayout that
    costs milliseconds on TPU; this stays in the native int8 layout.)"""
    B = rows.shape[0]
    W = TILE + 8
    x = rows[:, :W].astype(jnp.int32) & 0xFF
    d = jax.lax.broadcasted_iota(jnp.int32, (B, W), 1) - rbyte[:, None]
    sel = (d >= 0) & (d < 4)
    # int32 addition wraps, so the <<24 byte lands with correct sign bits
    contrib = jnp.where(sel, x << (8 * jnp.clip(d, 0, 3)), 0)
    return jnp.sum(contrib, axis=1)


def realign(rows: jax.Array, r: jax.Array, width: int) -> jax.Array:
    """rows[i, r_i : r_i + width] for per-row r_i in [0, TILE), gather-free.

    Barrel shifter: 10 masked static shifts instead of a per-row dynamic
    slice (XLA lowers the latter to a serial loop)."""
    B = rows.shape[0]
    x = rows[:, :TILE + width]
    for b in range(10):           # shifts 1..512 cover any r < 1024
        s = 1 << b
        shifted = jnp.concatenate(
            [x[:, s:], jnp.zeros((B, s), dtype=rows.dtype)], axis=1)
        x = jnp.where(((r[:, None] & s) != 0), shifted, x)
    return x[:, :width]
