"""Multi-host runtime: jax.distributed init + global mesh construction.

Replaces the reference's etcd-based cluster formation for the *compute*
plane (reference: etcd/embed.go:421 Start joins the raft cluster;
disco/disco.go:35): here N host processes join a JAX distributed system over
DCN (coordinator + heartbeats handled by the JAX runtime), every process
sees the global device set, and one logical "shards" mesh axis spans
(hosts x local chips).  Collectives lower hierarchically — ICI within a
host, DCN across hosts.  The HTTP cluster layer (cluster/) remains the
control plane for schema/writes; query aggregation inside a pod slice rides
this mesh (parallel/agg.py).

On CPU test rigs, cross-process collectives use the Gloo backend
(jax_cpu_collectives_implementation), exercised by tests/test_multihost.py
with 2 processes x 4 virtual devices.
"""
from __future__ import annotations

from typing import Optional

import numpy as np


def initialize(coordinator_address: str, num_processes: int, process_id: int,
               cpu_collectives: Optional[str] = None) -> None:
    """Join the distributed system.  Call before any other JAX API.

    cpu_collectives: set to "gloo" on CPU-backend rigs (cross-process CPU
    collectives need a backend; TPU pods use ICI/DCN natively).
    """
    import jax
    if cpu_collectives:
        jax.config.update("jax_cpu_collectives_implementation",
                          cpu_collectives)
    jax.distributed.initialize(coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def global_mesh():
    """1-D 'shards' mesh over every device of every process.

    Device order groups each process's devices contiguously, so a
    block-sharded stacked tile keeps each host's shard range local and
    psum lowers to an ICI reduction + DCN all-reduce of partials."""
    import jax
    from jax.sharding import Mesh
    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    return Mesh(np.array(devs), ("shards",))


def put_sharded(host: np.ndarray, sharding):
    """Create a global sharded array from replicated host data.

    Works in both single- and multi-process settings: each process
    materializes only its addressable shards (multi-process jax.device_put
    would reject non-addressable placements)."""
    import jax
    return jax.make_array_from_callback(host.shape, sharding,
                                        lambda idx: host[idx])
