"""Dynamic membership: node join/leave with topology broadcast and shard
rebalance (reference analogs: etcd watchNodes snapshot rebuild
etcd/embed.go:711; DAX RegisterWorker + balancer rebalance
dax/controller/controller.go:30 — the monolith reference removed cluster
resize, broadcast.go:63 messageTypeUNUSED0, so elastic membership is the
DAX role folded into the cluster layer)."""
import numpy as np

from featurebase_tpu.core.consts import SHARD_WIDTH as SW
from featurebase_tpu.testing import TestCluster


def seed(tc, n_shards=6, per_shard=50):
    tc.http(0, "POST", "/index/m", body={"options": {}})
    tc.http(0, "POST", "/index/m/field/f",
            body={"options": {"type": "set"}})
    rng = np.random.default_rng(3)
    total = 0
    for s in range(n_shards):
        cols = np.sort(rng.choice(SW, size=per_shard, replace=False)) \
            + s * SW
        tc.http(0, "POST", "/index/m/field/f/import",
                body={"rowIDs": [1] * per_shard,
                      "columnIDs": [int(c) for c in cols]})
        total += per_shard
    return total


class TestJoin:
    def test_join_propagates_topology(self):
        with TestCluster(2) as tc:
            seed(tc, n_shards=2)
            tc.add_node()
            for i in range(3):
                ids = {n.id for n in tc[i].cluster.snapshot.nodes}
                assert ids == {"node0", "node1", "node2"}, f"node {i}"

    def test_join_rebalances_and_serves(self):
        with TestCluster(2) as tc:
            total = seed(tc)
            before = tc.query(0, "m", "Count(Row(f=1))")["results"][0]
            assert before == total
            api3 = tc.add_node()
            # new node owns some shards after the jump-hash re-derivation
            snap = api3.cluster.snapshot
            owned = [s for s in range(6)
                     if snap.owns_shard("node2", "m", s)]
            assert owned, "join must move some shards to the new node"
            # counts stay exact from every node, including the joiner
            for i in range(3):
                got = tc.query(i, "m", "Count(Row(f=1))")["results"][0]
                assert got == total, f"count from node {i}"

    def test_join_then_write_routes_through_new_node(self):
        with TestCluster(2) as tc:
            seed(tc, n_shards=2)
            tc.add_node()
            # write a column in every shard's range via node 0
            for s in range(6):
                tc.query(0, "m", f"Set({s * SW + 99}, f=7)")
            for i in range(3):
                got = tc.query(i, "m", "Count(Row(f=7))")["results"][0]
                assert got == 6, f"count from node {i}"

    def test_leave_rebalances_to_survivors(self):
        with TestCluster(3, replicas=2) as tc:
            total = seed(tc)
            # retire node2: survivors take over its shards from replicas
            tc.http(0, "POST", "/internal/cluster/leave",
                    body={"id": "node2"})
            tc.stop_node(2)
            for i in range(2):
                ids = {n.id for n in tc[i].cluster.snapshot.nodes}
                assert ids == {"node0", "node1"}, f"node {i}"
                got = tc.query(i, "m", "Count(Row(f=1))")["results"][0]
                assert got == total, f"count from node {i}"

    def test_remove_last_node_rejected(self):
        with TestCluster(1) as tc:
            try:
                tc.http(0, "POST", "/internal/cluster/leave",
                        body={"id": "node0"})
                raise AssertionError("expected an error")
            except Exception:
                pass
