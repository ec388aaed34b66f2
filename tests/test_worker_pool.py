"""Intra-node worker pool over per-shard fallback jobs (reference:
task/pool.go:22, executor.go mapperLocal job channel)."""
import threading

import numpy as np

from featurebase_tpu.core.consts import SHARD_WIDTH as SW
from featurebase_tpu.executor.executor import Executor
from featurebase_tpu.model.field import FieldOptions
from featurebase_tpu.model.index import Holder
from featurebase_tpu.utils.pool import map_shards


def test_map_shards_parallel_and_ordered():
    gate = threading.Barrier(2, timeout=10)   # pool floor is 2 workers

    def job(i):
        if i < 2:
            gate.wait()   # times out unless 2 jobs run concurrently
        return i * i

    assert map_shards(job, [0, 1, 2, 3]) == [0, 1, 4, 9]


def test_map_shards_propagates_exceptions():
    def job(i):
        if i == 2:
            raise ValueError("boom")
        return i

    try:
        map_shards(job, [1, 2, 3])
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_pooled_aggregates_match_across_shards():
    """Sum/Min/Max over 6 shards through the pooled fallback equals the
    numpy oracle."""
    holder = Holder()
    idx = holder.create_index("p")
    idx.create_field("v", FieldOptions(type="int", min=-500, max=500))
    rng = np.random.default_rng(7)
    cols = np.sort(rng.choice(6 * SW, size=3000, replace=False))
    vals = rng.integers(-500, 500, size=3000)
    idx.field("v").import_values(cols, vals)
    idx.mark_exists(cols)
    e = Executor(holder)
    (s,) = e.execute("p", "Sum(field=v)")
    (mn,) = e.execute("p", "Min(field=v)")
    (mx,) = e.execute("p", "Max(field=v)")
    assert (s.val, s.count) == (int(vals.sum()), 3000)
    assert (mn.val, mx.val) == (int(vals.min()), int(vals.max()))
