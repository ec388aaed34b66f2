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


class TestTopologyEpoch:
    """Topology broadcasts carry a (version, origin) epoch; stale messages
    are ignored so a delayed older broadcast can't overwrite newer
    membership (advisor finding r2; the reference gets a single consistent
    view from etcd)."""

    def test_version_bumps_on_change(self):
        with TestCluster(2) as tc:
            v0 = tc[0].cluster.snapshot.version
            tc.add_node()
            assert tc[0].cluster.snapshot.version > v0

    def test_stale_broadcast_ignored(self):
        with TestCluster(2) as tc:
            tc.add_node()
            cur = tc[0].cluster.snapshot
            assert len(cur.nodes) == 3
            # replay an old 2-node topology with a stale version
            stale_nodes = [n.to_json() for n in cur.nodes[:2]]
            tc[0].handle_cluster_message(
                {"type": "topology", "nodes": stale_nodes,
                 "version": cur.version - 1, "origin": cur.origin})
            assert len(tc[0].cluster.snapshot.nodes) == 3
            assert tc[0].cluster.snapshot.version == cur.version

    def test_newer_broadcast_applies(self):
        with TestCluster(2) as tc:
            cur = tc[0].cluster.snapshot
            nodes = [n.to_json() for n in cur.nodes]
            tc[0].handle_cluster_message(
                {"type": "topology", "nodes": nodes,
                 "version": cur.version + 5, "origin": "elsewhere"})
            assert tc[0].cluster.snapshot.version == cur.version + 5

    def test_concurrent_joins_merge(self):
        """Two joins processed concurrently by the same member must both
        land (the merged node list is built under the cluster lock — the
        r2 TOCTOU let one join drop the other's node)."""
        import threading

        from featurebase_tpu.cluster.cluster import Cluster
        c = Cluster("node0", [{"id": "node0", "uri": "http://x:1"}])
        barrier = threading.Barrier(2)

        def join(i):
            barrier.wait(timeout=5)
            c.join_node({"id": f"joiner{i}", "uri": f"http://x:{i + 2}"},
                        force=True)  # fake peers: bypass the quorum probe

        ts = [threading.Thread(target=join, args=(i,)) for i in range(2)]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=10)
        ids = {n.id for n in c.snapshot.nodes}
        assert ids == {"node0", "joiner0", "joiner1"}
        assert c.snapshot.version == 2


class TestQuorumGate:
    """Topology changes require a reachable majority (the etcd-raft role
    for admin operations); force=True overrides for 2-node dead-peer
    removal."""

    @staticmethod
    def _leave(tc, i, body):
        import json as _json
        import urllib.error
        import urllib.request
        req = urllib.request.Request(
            tc.url(i) + "/internal/cluster/leave",
            data=_json.dumps(body).encode(), method="POST")
        try:
            with urllib.request.urlopen(req, timeout=30) as resp:
                return resp.status, _json.loads(resp.read() or b"{}")
        except urllib.error.HTTPError as e:
            return e.code, _json.loads(e.read() or b"{}")

    def test_minority_cannot_remove(self):
        with TestCluster(3) as tc:
            tc.stop_node(1)
            tc.stop_node(2)
            # node0 alone = 1/3 reachable: no quorum
            code, out = self._leave(tc, 0, {"id": "node2"})
            assert code == 503, out
            assert "majority" in out.get("error", "")
            ids = {n.id for n in tc[0].cluster.snapshot.nodes}
            assert ids == {"node0", "node1", "node2"}

    def test_majority_can_remove_dead_node(self):
        with TestCluster(3) as tc:
            tc.stop_node(2)
            # node0 + node1 = 2/3: quorum holds, dead node2 retires
            code, out = self._leave(tc, 0, {"id": "node2"})
            assert code == 200, out
            assert {n.id for n in tc[0].cluster.snapshot.nodes} == \
                {"node0", "node1"}

    def test_force_overrides_quorum(self):
        with TestCluster(2) as tc:
            tc.stop_node(1)
            code, out = self._leave(tc, 0, {"id": "node1"})
            assert code == 503
            code, out = self._leave(tc, 0, {"id": "node1", "force": True})
            assert code == 200, out
            assert [n.id for n in tc[0].cluster.snapshot.nodes] == ["node0"]
