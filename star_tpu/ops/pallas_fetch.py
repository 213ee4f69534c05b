"""Pallas random-window fetch kernel (parallel DMA gather).

Motivation (measured on v5e): XLA lowers big-table gathers to a serial
per-row loop (~1.8us per random 128B row). The MMP bisection issues ~55
dependent [B,128] gathers per dispatch, so with realistic (cache-cold) probe
positions the XLA kernel runs at ~10K probes/s. This kernel instead issues
one aligned 2KB DMA per probe with 32 copies in flight per grid step:
8192 random fetches complete in ~2.3ms (vs ~15ms for a single XLA gather
step), because the DMA engine overlaps the HBM latency.

Constraints discovered on the way (Mosaic verifier):
  * 1-D int8 HBM slices must have 1024-aligned start AND length;
  * dynamic single-row slices of 2-D (tiled) refs are unsupported, so the
    destination is a flat 1-D VMEM block with static per-slot offsets.

Status: correctness-verified prototype. The remaining work before swapping it
into ops/sa_search.py is the post-fetch realignment: XLA's per-row
take_along_axis on the 2KB rows is itself slow (~11ms), so the realign (or
the whole compare) must move in-kernel (dynamic sublane+lane rotate) or the
table must be stored at multiple 128B-shifted copies so the window lands in
the first 256B of the fetch. Tracked for round 2.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 1024
FET = 2048


def make_tile_fetch(t2_padded: jax.Array, batch: int, blk: int = 32):
    """returns fetch(pos[int32 B]) -> [B, FET] int8 rows; each row holds the
    1024-aligned 2KB neighbourhood of pos[i]; the window starts at
    pos[i] % 1024 within its row."""
    assert batch % blk == 0

    def kern(pos_ref, t2_ref, out_ref, sems):
        b = pl.program_id(0)

        def issue(i):
            start = (pos_ref[b * blk + i] // TILE) * TILE
            start = pl.multiple_of(start, TILE)
            return pltpu.make_async_copy(
                t2_ref.at[pl.ds(start, FET)],
                out_ref.at[pl.ds(i * FET, FET)],
                sems.at[i])
        for i in range(blk):
            issue(i).start()
        for i in range(blk):
            issue(i).wait()

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(batch // blk,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((blk * FET,), lambda i, pos: (i,),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA((blk,))],
    )

    def fetch(pos):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((batch * FET,), jnp.int8),
            grid_spec=grid_spec,
        )(pos, t2_padded).reshape(batch, FET)

    return jax.jit(fetch)


def pad_table(t2: np.ndarray) -> np.ndarray:
    n = ((len(t2) + FET + TILE - 1) // TILE) * TILE
    out = np.full(n, 5, dtype=np.int8)
    out[:len(t2)] = t2
    return out
