"""Intra-node worker pool for per-shard jobs.

The reference executes local shards through an elastic goroutine pool
(reference: task/pool.go:22, executor.go:6714-6760 job channel /
doOneJob).  Plannable calls here batch all shards into ONE stacked XLA
program instead (executor/plan.py) — that is the idiomatic replacement.
This pool covers the residual per-shard interpreter fallbacks: each shard
job mixes host numpy with device dispatches, and both release the GIL, so
threads overlap host prep on one shard with device work on another.

Results are returned in submission order, so associative-but-ordered
merges (ValCount.smaller, Pairs.Add) stay deterministic.
"""
from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, List, Sequence, TypeVar

T = TypeVar("T")
R = TypeVar("R")

_POOL: ThreadPoolExecutor | None = None


def _pool() -> ThreadPoolExecutor:
    global _POOL
    if _POOL is None:
        _POOL = ThreadPoolExecutor(
            max_workers=max(2, os.cpu_count() or 4),
            thread_name_prefix="shard-worker")
    return _POOL


def map_shards(fn: Callable[[T], R], items: Sequence[T]) -> List[R]:
    """Apply fn to every item, in parallel when there is more than one.
    Exceptions propagate (first one raised, like the reference's errgroup
    behavior in mapperLocal).  The submitting thread's context propagates
    to workers (per-item copy) so snapshot pins (model/snapshot.py) hold
    across the pool — a Context can't be entered concurrently, hence one
    copy per item."""
    if len(items) <= 1:
        return [fn(it) for it in items]
    import contextvars
    ctxs = [contextvars.copy_context() for _ in items]
    return list(_pool().map(lambda pair: pair[0].run(fn, pair[1]),
                            zip(ctxs, items)))
