"""Pallas TPU kernels for the hot bitmap ops.

The engine's speed-of-light ops are HBM-bandwidth-bound streaming scans
(reference's roaring kernels, roaring/roaring.go:711-1663, recast as dense
tile ops).  XLA already fuses AND+popcount+reduce well; these Pallas
versions exist to (a) pin the blocking so multi-megabyte scans stream
through VMEM in hardware-aligned (8×128-multiple) tiles without relying on
fusion heuristics, and (b) fuse the *multi-row* filtered-count pattern
(TopN/GroupBy inner loop: R rows ANDed against one filter, counted per
row) into a single pass over the tile.

Selection: `use_pallas()` is True on TPU backends (override with
FEATUREBASE_TPU_PALLAS=0/1).  On CPU the XLA paths run; tests exercise
these kernels via interpret mode.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# lane-aligned block sizes: last dim multiple of 128, uint32 tiles (8, 128)
_BLOCK_ROWS = 8
_BLOCK_COLS = 4096


@functools.lru_cache(maxsize=1)
def use_pallas() -> bool:
    env = os.environ.get("FEATUREBASE_TPU_PALLAS")
    if env is not None:
        return env not in ("0", "false", "")
    return jax.default_backend() == "tpu"


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# -- fused AND + popcount + reduce (reference: IntersectionCount,
# roaring.go:1078) -------------------------------------------------------------


def _count_and_kernel(a_ref, b_ref, out_ref):
    pc = jax.lax.population_count(jnp.bitwise_and(a_ref[:], b_ref[:]))
    # Mosaic has no unsigned reductions; block sums fit int32 (<= 2^23 bits)
    out_ref[0, 0] = jnp.sum(pc.astype(jnp.int32))


def _pad_rows(x, bm):
    r = x.shape[0] % bm
    if r:
        x = jnp.pad(x, ((0, bm - r), (0, 0)))
    return x


@jax.jit
def count_and_pallas(a, b):
    """popcount(a & b) over equal-shape uint32 arrays -> uint32 scalar."""
    a2 = a.reshape(-1, _BLOCK_COLS) if a.size % _BLOCK_COLS == 0 \
        else a.reshape(1, -1)
    b2 = b.reshape(a2.shape)
    bm = min(_BLOCK_ROWS, a2.shape[0])
    a2 = _pad_rows(a2, bm)
    b2 = _pad_rows(b2, bm)
    rows = a2.shape[0]
    grid = (pl.cdiv(rows, bm),)
    partials = pl.pallas_call(
        _count_and_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, a2.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, a2.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1), lambda i: (i, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((grid[0], 1), jnp.int32),
        interpret=_interpret(),
    )(a2, b2)
    return jnp.sum(partials.astype(jnp.uint32), dtype=jnp.uint32)


# -- per-row filtered popcount (reference: fragment.top / GroupBy inner
# counts — R candidate rows against one filter) -------------------------------


def _count_rows_kernel(tile_ref, filt_ref, out_ref):
    pc = jax.lax.population_count(
        jnp.bitwise_and(tile_ref[:], filt_ref[:]))
    out_ref[:] = jnp.sum(pc.astype(jnp.int32), axis=1, keepdims=True)


@jax.jit
def count_and_rows_pallas(tile, filt):
    """(R, W) & (W,) -> per-row uint32 popcounts (R,)."""
    R, W = tile.shape
    filt2 = jnp.broadcast_to(filt.reshape(1, W), (1, W))
    bm = _BLOCK_ROWS
    tile = _pad_rows(tile, bm)
    grid = (pl.cdiv(tile.shape[0], bm),)
    out = pl.pallas_call(
        _count_rows_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, W), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((grid[0] * bm, 1), jnp.int32),
        interpret=_interpret(),
    )(tile, filt2)
    return out[:R, 0].astype(jnp.uint32)


def _popcount_rows_kernel(tile_ref, out_ref):
    pc = jax.lax.population_count(tile_ref[:])
    out_ref[:] = jnp.sum(pc.astype(jnp.int32), axis=1, keepdims=True)


@jax.jit
def popcount_rows_pallas(tile):
    """(R, W) -> per-row uint32 popcounts (R,)."""
    R, W = tile.shape
    bm = _BLOCK_ROWS
    tile = _pad_rows(tile, bm)
    grid = (pl.cdiv(tile.shape[0], bm),)
    out = pl.pallas_call(
        _popcount_rows_kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((bm, W), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((bm, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((grid[0] * bm, 1), jnp.int32),
        interpret=_interpret(),
    )(tile)
    return out[:R, 0].astype(jnp.uint32)
