"""Device mesh and shard placement.

Replaces the reference's cluster topology machinery (reference: cluster.go:29,
disco/snapshot.go:24-135 ShardToShardPartition + jump-hash PartitionNodes)
with a JAX device mesh: shards hash to partitions exactly as the reference
does (FNV-1a, 256 partitions, jump hash) but partitions map to *devices* in a
`jax.sharding.Mesh` instead of HTTP nodes, and the executor's scatter-gather
becomes sharded-array XLA programs whose reductions ride ICI.

Mesh axes:
  "shards" — data-parallel axis over which stacked shard tiles are split.
A 2-D (hosts, chips) layout is expressed by flattening into one logical
"shards" axis; XLA lowers the reductions to hierarchical ICI/DCN collectives.
"""
from __future__ import annotations

from typing import List, Optional

import numpy as np

from featurebase_tpu.storage.translate import (jump_hash,
                                               shard_to_shard_partition)


def make_mesh(n_devices: Optional[int] = None, devices=None):
    """Create a 1-D 'shards' mesh over the available (or given) devices."""
    import jax
    from jax.sharding import Mesh
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.array(devices), ("shards",))


def shard_device(index: str, shard: int, n_devices: int,
                 partition_n: int = 256) -> int:
    """Deterministic shard -> device assignment (reference semantics:
    shard -> partition via FNV-1a, partition -> node via jump hash;
    disco/snapshot.go:96 PrimaryNodeIndex)."""
    part = shard_to_shard_partition(index, shard, partition_n)
    return jump_hash(part, n_devices)


def shards_by_device(index: str, shards: List[int], n_devices: int):
    """Group shards by owning device (reference executor.go:6416
    shardsByNode)."""
    out: dict = {}
    for s in shards:
        out.setdefault(shard_device(index, s, n_devices), []).append(s)
    return out
