"""Mesh-lowered aggregation kernels: shard_map + psum over the 'shards' axis.

This is the TPU-native replacement for the reference's coordinator-reduce
(reference: executor.go:6449 mapReduce streams per-shard partials over HTTP
and merges at the coordinator).  Here the shard axis of every stacked tile is
sharded over a jax Mesh — single host (chips over ICI) or multi-host
(jax.distributed processes over DCN; see parallel/multihost.py) — and the
associative merges (count sums, per-row TopN counts, GroupBy pair counts,
BSI plane popcounts) lower to `psum` collectives that ride the interconnect
instead of the network stack.

Every kernel takes stacked device arrays whose leading axis is sharded with
PartitionSpec("shards") and returns fully-replicated small results (the
cross-shard reduction happens inside shard_map).  Counts are uint32 on
device (TPU runs without x64); callers that could overflow 2^32 total bits
must chunk (a single shard row holds <= 2^20 bits, so this allows ~4K full
shards per call).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

_AXIS = "shards"


def _pop(x):
    return jax.lax.population_count(x).astype(jnp.uint32)


def _smap(mesh, fn, in_specs, out_specs):
    return jax.jit(jax.shard_map(fn, mesh=mesh, in_specs=in_specs,
                                 out_specs=out_specs))


# -- Count(expr): total popcount over all shards ----------------------------

@functools.lru_cache(maxsize=None)
def _total_count_fn(mesh):
    def local(w):  # (s, W)
        return jax.lax.psum(jnp.sum(_pop(w), dtype=jnp.uint32), _AXIS)
    return _smap(mesh, local, (P(_AXIS),), P())


def total_count(mesh, words) -> int:
    """Global popcount of a sharded (S, W) stack -> int."""
    return int(_total_count_fn(mesh)(words))


# -- per-row counts (TopN / Rows / Distinct-set; reference fragment.top
# fragment.go:1317 + Pairs.Add coordinator merge) ---------------------------

@functools.lru_cache(maxsize=None)
def _row_counts_fn(mesh):
    def local(t, f):  # t (s, R, W), f (s, W)
        pc = jnp.sum(_pop(jnp.bitwise_and(t, f[:, None, :])),
                     axis=(0, 2), dtype=jnp.uint32)
        return jax.lax.psum(pc, _AXIS)
    return _smap(mesh, local, (P(_AXIS), P(_AXIS)), P())


def row_counts(mesh, tiles, filt):
    """Global per-row filtered counts: (S, R, W) x (S, W) -> (R,) uint32."""
    return _row_counts_fn(mesh)(tiles, filt)


# -- GroupBy frontier expansion (reference groupByIterator executor.go:8617
# + mergeGroupCounts:3728, here one psum per level) --------------------------

@functools.lru_cache(maxsize=None)
def _pair_counts_fn(mesh):
    def local(m, t):  # m (s, F, W), t (s, R, W)
        pc = jnp.sum(
            _pop(jnp.bitwise_and(m[:, :, None, :], t[:, None, :, :])),
            axis=(0, 3), dtype=jnp.uint32)
        return jax.lax.psum(pc, _AXIS)
    return _smap(mesh, local, (P(_AXIS), P(_AXIS)), P())


def pair_counts(mesh, masks, tile):
    """Global cross-product counts: (S, F, W) x (S, R, W) -> (F, R)."""
    return _pair_counts_fn(mesh)(masks, tile)


@functools.lru_cache(maxsize=None)
def _gather_and_fn(mesh):
    def local(m, t, fi, rj):  # indices replicated
        return jnp.bitwise_and(jnp.take(m, fi, axis=1),
                               jnp.take(t, rj, axis=1))
    return _smap(mesh, local, (P(_AXIS), P(_AXIS), P(), P()), P(_AXIS))


def gather_and(mesh, masks, tile, fi, rj):
    """Materialize surviving combos shard-locally: -> (S, K, W) sharded."""
    return _gather_and_fn(mesh)(masks, tile, fi, rj)


@functools.lru_cache(maxsize=None)
def _mask_filter_fn(mesh):
    def local(t, f):
        return jnp.bitwise_and(t, f[:, None, :])
    return _smap(mesh, local, (P(_AXIS), P(_AXIS)), P(_AXIS))


def mask_filter(mesh, tiles, filt):
    """(S, R, W) & (S, W) -> (S, R, W), shard-local."""
    return _mask_filter_fn(mesh)(tiles, filt)


@functools.lru_cache(maxsize=None)
def _take_rows_fn(mesh):
    def local(m, keep):
        return jnp.take(m, keep, axis=1)
    return _smap(mesh, local, (P(_AXIS), P()), P(_AXIS))


def take_rows(mesh, masks, keep):
    """(S, F, W) -> (S, K, W) keeping the given frontier indices."""
    return _take_rows_fn(mesh)(masks, keep)


# -- BSI aggregates (reference fragment.sum:724 via BitmapBSICountFilter) ----

@functools.lru_cache(maxsize=None)
def _sum_planes_fn(mesh):
    def local(bsi, f):  # bsi (s, D+2, W), f (s, W)
        exists = jnp.bitwise_and(bsi[:, 0, :], f)
        sign = bsi[:, 1, :]
        slices = bsi[:, 2:, :]
        pos = jnp.bitwise_and(exists, jnp.bitwise_not(sign))
        neg = jnp.bitwise_and(exists, sign)
        pos_pops = jnp.sum(_pop(jnp.bitwise_and(slices, pos[:, None, :])),
                           axis=(0, 2), dtype=jnp.uint32)
        neg_pops = jnp.sum(_pop(jnp.bitwise_and(slices, neg[:, None, :])),
                           axis=(0, 2), dtype=jnp.uint32)
        count = jnp.sum(_pop(exists), dtype=jnp.uint32)
        return (jax.lax.psum(pos_pops, _AXIS), jax.lax.psum(neg_pops, _AXIS),
                jax.lax.psum(count, _AXIS))
    return _smap(mesh, local, (P(_AXIS), P(_AXIS)), (P(), P(), P()))


def sum_planes(mesh, bsi, filt):
    """Global Sum parts: (pos_pops (D,), neg_pops (D,), count) uint32.
    Host finalizes sum = Σ 2^i (pos_i - neg_i) with exact Python ints."""
    return _sum_planes_fn(mesh)(bsi, filt)


@functools.lru_cache(maxsize=None)
def _group_sums_fn(mesh):
    def local(masks, bsi):  # masks (s, G, W), bsi (s, D+2, W)
        exists = bsi[:, 0, :]
        sign = bsi[:, 1, :]
        slices = bsi[:, 2:, :]
        pos = jnp.bitwise_and(exists, jnp.bitwise_not(sign))
        neg = jnp.bitwise_and(exists, sign)
        sp = jnp.bitwise_and(slices, pos[:, None, :])  # (s, D, W)
        sn = jnp.bitwise_and(slices, neg[:, None, :])
        pp = jnp.sum(
            _pop(jnp.bitwise_and(masks[:, :, None, :], sp[:, None, :, :])),
            axis=(0, 3), dtype=jnp.uint32)  # (G, D)
        np_ = jnp.sum(
            _pop(jnp.bitwise_and(masks[:, :, None, :], sn[:, None, :, :])),
            axis=(0, 3), dtype=jnp.uint32)
        counts = jnp.sum(_pop(jnp.bitwise_and(masks, exists[:, None, :])),
                         axis=(0, 2), dtype=jnp.uint32)  # (G,)
        return (jax.lax.psum(pp, _AXIS), jax.lax.psum(np_, _AXIS),
                jax.lax.psum(counts, _AXIS))
    return _smap(mesh, local, (P(_AXIS), P(_AXIS)), (P(), P(), P()))


def group_sums(mesh, masks, bsi):
    """Batched GroupBy Sum aggregate: (pos (G, D), neg (G, D), counts (G,))."""
    return _group_sums_fn(mesh)(masks, bsi)


def finalize_sum(pos_pops, neg_pops) -> int:
    """Exact Σ 2^i (pos_i - neg_i) from per-plane popcounts (host ints)."""
    import numpy as np
    pp = np.asarray(pos_pops).astype(np.int64)
    nn = np.asarray(neg_pops).astype(np.int64)
    return sum((1 << i) * (int(pp[i]) - int(nn[i])) for i in range(pp.size))
