"""Bitwise set-algebra kernels over dense bitmap tiles.

These replace the reference's 9-way per-container-type roaring kernels
(reference: roaring/roaring.go:711-1663 intersect/union/difference/xor and
IntersectionCount variants).  On TPU every row is a dense (WORDS_PER_ROW,)
uint32 vector, so all container-type dispatch disappears: one VPU-bound
elementwise op per combinator, with popcount reductions fused by XLA so that
Count(Intersect(a, b)) is a single pass over HBM.

All functions are shape-polymorphic over leading batch dims: inputs are
uint32 arrays of shape (..., W).
"""
from functools import partial

import jax
import jax.numpy as jnp

from featurebase_tpu.core.consts import SHARD_WIDTH, WORD_BITS, WORDS_PER_ROW

_u32 = jnp.uint32


# ---------------------------------------------------------------------------
# Elementwise combinators (VPU)
# ---------------------------------------------------------------------------

@jax.jit
def b_and(a, b):
    return jnp.bitwise_and(a, b)


@jax.jit
def b_or(a, b):
    return jnp.bitwise_or(a, b)


@jax.jit
def b_xor(a, b):
    return jnp.bitwise_xor(a, b)


@jax.jit
def b_andnot(a, b):
    """a AND NOT b (reference Difference, roaring.go:1179)."""
    return jnp.bitwise_and(a, jnp.bitwise_not(b))


@jax.jit
def b_not(a):
    """Full complement over the shard universe.

    The reference's Not() intersects with the index existence row at the
    executor level (reference: executor.go:5554 executeNotShard); callers here
    are expected to AND with an existence row themselves.
    """
    return jnp.bitwise_not(a)


# ---------------------------------------------------------------------------
# Popcount reductions
# ---------------------------------------------------------------------------

@jax.jit
def popcount(a):
    """Total set-bit count, reduced over every axis. Returns uint32 scalar.

    NOTE: device math is 32-bit (TPU runs without x64).  A single shard-row
    holds at most 2^20 bits so per-row counts always fit; whole-tile
    reductions fit until ~4096 completely-full rows.  Multi-row callers that
    could exceed that use popcount_rows + host-side Python-int summation.
    """
    return jnp.sum(jax.lax.population_count(a).astype(jnp.uint32),
                   dtype=jnp.uint32)


@jax.jit
def popcount_rows(a):
    """Per-row popcount: reduce only the trailing word axis -> (...,)."""
    return jnp.sum(jax.lax.population_count(a).astype(jnp.uint32),
                   axis=-1, dtype=jnp.uint32)


@jax.jit
def _count_and_xla(a, b):
    return jnp.sum(
        jax.lax.population_count(jnp.bitwise_and(a, b)).astype(jnp.uint32),
        dtype=jnp.uint32)


def count_and(a, b):
    """Fused popcount(a & b) — reference IntersectionCount
    (roaring.go:1078 intersectBitmapBitmapInPlace + count paths).
    Uses the Pallas streaming kernel on TPU (ops/pallas_kernels.py)."""
    from featurebase_tpu.ops import pallas_kernels as pk
    if pk.use_pallas():
        return pk.count_and_pallas(a, b)
    return _count_and_xla(a, b)


@jax.jit
def _count_and_rows_xla(a, b):
    return jnp.sum(
        jax.lax.population_count(jnp.bitwise_and(a, b)).astype(jnp.uint32),
        axis=-1, dtype=jnp.uint32)


def count_and_rows(a, b):
    """Per-row fused intersection count over trailing axis (Pallas-fused
    multi-row scan on TPU)."""
    from featurebase_tpu.ops import pallas_kernels as pk
    if pk.use_pallas() and a.ndim == 2 and b.ndim == 2 and b.shape[0] == 1:
        return pk.count_and_rows_pallas(a, b[0])
    return _count_and_rows_xla(a, b)


@jax.jit
def any_set(a):
    """True if any bit set."""
    return jnp.any(a != 0)


@jax.jit
def count_and_pairs(masks, tile):
    """All-pairs fused intersection counts: (F, W) x (R, W) -> (F, R).

    The GroupBy cross-product inner op (reference: groupByIterator
    executor.go:8617 walks one (row, row) combination at a time; here one
    fused XLA op counts every combination of a frontier of F partial group
    masks against the next dimension's R rows — AND+popcount+reduce fuse, so
    the (F, R, W) intermediate never materializes in HBM)."""
    return jnp.sum(
        jax.lax.population_count(
            jnp.bitwise_and(masks[:, None, :], tile[None, :, :])
        ).astype(jnp.uint32),
        axis=-1, dtype=jnp.uint32)


# -- stacked (S, ...) kernels: one program over every shard's tile, so a
# query costs ONE dispatch + ONE host sync regardless of shard count
# (replaces per-shard loops; with mesh-sharded inputs XLA lowers the
# cross-shard reduction to collectives automatically) -----------------------


@jax.jit
def stacked_row_counts(tiles):
    """(S, R, W) -> (R,) uint32 per-row popcounts summed over shards."""
    return jnp.sum(jax.lax.population_count(tiles).astype(jnp.uint32),
                   axis=(0, 2), dtype=jnp.uint32)


@jax.jit
def stacked_filtered_row_counts(tiles, filt):
    """(S, R, W) x (S, W) -> (R,) uint32."""
    x = jnp.bitwise_and(tiles, filt[:, None, :])
    return jnp.sum(jax.lax.population_count(x).astype(jnp.uint32),
                   axis=(0, 2), dtype=jnp.uint32)


@jax.jit
def per_shard_row_counts(tiles):
    """(S, R, W) -> (S, R) uint32 per-shard per-row popcounts."""
    return jnp.sum(jax.lax.population_count(tiles).astype(jnp.uint32),
                   axis=-1, dtype=jnp.uint32)


@jax.jit
def per_shard_filtered_row_counts(tiles, filt):
    """(S, R, W) x (S, W) -> (S, R) uint32."""
    x = jnp.bitwise_and(tiles, filt[:, None, :])
    return jnp.sum(jax.lax.population_count(x).astype(jnp.uint32),
                   axis=-1, dtype=jnp.uint32)


@jax.jit
def stacked_pair_counts(masks, tile):
    """(S, F, W) x (S, R, W) -> (F, R) uint32 fused cross-product counts."""
    return jnp.sum(
        jax.lax.population_count(
            jnp.bitwise_and(masks[:, :, None, :], tile[:, None, :, :])
        ).astype(jnp.uint32), axis=(0, 3), dtype=jnp.uint32)


@jax.jit
def stacked_all_pairs_and(masks, tile):
    """(S, F, W) x (S, R, W) -> (S, F*R, W), R fastest (itertools order)."""
    S, F, W = masks.shape
    R = tile.shape[1]
    return jnp.bitwise_and(masks[:, :, None, :], tile[:, None, :, :]) \
        .reshape(S, F * R, W)


@jax.jit
def stacked_mask_filter(tiles, filt):
    """(S, R, W) & (S, W) -> (S, R, W)."""
    return jnp.bitwise_and(tiles, filt[:, None, :])


@jax.jit
def all_pairs_and(masks, tile):
    """Materialize every cross-product mask: (F, W) x (R, W) -> (F*R, W),
    ordered with the R index fastest (row-major, matching
    itertools.product).  Used by the one-shot GroupBy path for small
    cross-products, where skipping per-level host pruning syncs beats the
    memory saved by pruning."""
    F, W = masks.shape
    R = tile.shape[0]
    return jnp.bitwise_and(masks[:, None, :], tile[None, :, :]) \
        .reshape(F * R, W)


@jax.jit
def and_pairs_gather(masks, tile, fi, rj):
    """Materialize surviving cross-product masks: masks[fi] & tile[rj].

    fi/rj are parallel (K,) index vectors of the nonzero combinations kept
    after count pruning; returns (K, W)."""
    return jnp.bitwise_and(jnp.take(masks, fi, axis=0),
                           jnp.take(tile, rj, axis=0))


@jax.jit
def or_reduce_rows(tile):
    """OR-reduce a (R, W) tile over rows -> (W,) (n-way union, reference
    roaring.go:1410 unionInPlace bitmap-accumulator strategy)."""
    return jax.lax.reduce(tile, jnp.uint32(0), jax.lax.bitwise_or, [0])


# ---------------------------------------------------------------------------
# Shift (reference: executor.go:5818 executeShiftShard, row.go Shift)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnums=(1,))
def b_shift(a, n: int = 1):
    """Shift every set bit's column up by n (bits shifted past the shard
    boundary are dropped, matching single-shard semantics of the reference's
    per-segment shift)."""
    if n == 0:
        return a
    word_shift = n // WORD_BITS
    bit_shift = n % WORD_BITS
    # shift words toward higher indices
    if word_shift:
        a = jnp.roll(a, word_shift, axis=-1)
        idx = jax.lax.broadcasted_iota(jnp.int32, a.shape, len(a.shape) - 1)
        a = jnp.where(idx < word_shift, _u32(0), a)
    if bit_shift:
        lo = a << _u32(bit_shift)
        carry = a >> _u32(WORD_BITS - bit_shift)
        carry = jnp.roll(carry, 1, axis=-1)
        idx = jax.lax.broadcasted_iota(jnp.int32, a.shape, len(a.shape) - 1)
        carry = jnp.where(idx < 1, _u32(0), carry)
        a = lo | carry
    return a


# ---------------------------------------------------------------------------
# Range masks (reference: roaring CountRange / OffsetRange usage in
# fragment.rangeOp helpers)
# ---------------------------------------------------------------------------

def range_mask(start: int, stop: int, width: int = SHARD_WIDTH):
    """Dense mask with bits [start, stop) set, as a (width/32,) uint32 vector.

    Host-side helper (static bounds): used to build column filters.
    """
    import numpy as np
    w = width // WORD_BITS
    out = np.zeros(w, dtype=np.uint32)
    if stop <= start:
        return out
    start = max(start, 0)
    stop = min(stop, width)
    sw, ew = start // WORD_BITS, (stop - 1) // WORD_BITS
    if sw == ew:
        bits = 0
        for b in range(start % WORD_BITS, ((stop - 1) % WORD_BITS) + 1):
            bits |= (1 << b)
        out[sw] = bits
    else:
        out[sw] = (0xFFFFFFFF << (start % WORD_BITS)) & 0xFFFFFFFF
        out[sw + 1:ew] = 0xFFFFFFFF
        out[ew] = 0xFFFFFFFF >> (WORD_BITS - 1 - ((stop - 1) % WORD_BITS))
    return out


# ---------------------------------------------------------------------------
# Bit <-> column extraction (host boundary)
# ---------------------------------------------------------------------------

def words_to_cols(words, base: int = 0):
    """Decode a dense word vector into a sorted numpy array of set columns.

    Host-side finalization (variable-shape output can't live under jit).
    Uses the C++ ctz decode when available (native/bitops.cpp — the host
    analog of roaring.Bitmap.Slice, roaring/roaring.go:573); numpy bit
    tricks otherwise."""
    import numpy as np
    w = np.asarray(words, dtype=np.uint32)
    from featurebase_tpu.native import bitops
    native = bitops.words_to_cols(w, base)
    if native is not None:
        return native
    flat = w.reshape(-1)
    # unpack via numpy bit tricks
    nz = np.nonzero(flat)[0]
    if nz.size == 0:
        return np.empty(0, dtype=np.uint64)
    cols = []
    vals = flat[nz]
    for b in range(WORD_BITS):
        mask = (vals >> np.uint32(b)) & np.uint32(1)
        hit = nz[mask.astype(bool)]
        if hit.size:
            cols.append(hit.astype(np.uint64) * WORD_BITS + b)
    out = np.concatenate(cols)
    out.sort()
    return out + np.uint64(base)


def cols_to_words(cols, width: int = SHARD_WIDTH):
    """Encode sorted column ids (< width) into a dense uint32 word vector
    (C++ scatter when available, numpy otherwise)."""
    import numpy as np
    c = np.asarray(cols, dtype=np.int64)
    from featurebase_tpu.native import bitops
    native = bitops.cols_to_words(c, width // WORD_BITS)
    if native is not None:
        return native
    out = np.zeros(width // WORD_BITS, dtype=np.uint32)
    if c.size == 0:
        return out
    np.bitwise_or.at(out, c >> 5, np.uint32(1) << (c & 31).astype(np.uint32))
    return out
