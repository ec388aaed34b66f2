"""Multi-node cluster tests: placement, broadcast, distributed queries,
replication, failover.

Modeled on the reference's in-process cluster harness tests (reference:
test/cluster.go MustRunCluster; executor_test.go distributed cases;
internal/clustertests/pause_node_test.go TestPauseReplica for failover).
Parity oracle: the same data on a single-node API must produce identical
JSON responses.
"""
import numpy as np
import pytest

from featurebase_tpu.cluster.topology import ClusterSnapshot, Node
from featurebase_tpu.core.consts import SHARD_WIDTH
from featurebase_tpu.server.api import API
from featurebase_tpu.server.serialize import response_to_json
from featurebase_tpu.testing import TestCluster

COLS = [1, 5, SHARD_WIDTH + 3, 2 * SHARD_WIDTH + 7, 5 * SHARD_WIDTH + 100,
        9 * SHARD_WIDTH + 2, 3, SHARD_WIDTH + 9]
ROWS = [1, 1, 1, 2, 2, 3, 4, 4]
VALS = [10, -3, 42, 7, 42, 5, 0, 99]

QUERIES = [
    "Count(Row(f=1))",
    "Row(f=2)",
    "Count(Union(Row(f=1), Row(f=2)))",
    "Count(Intersect(Row(f=1), Row(f=4)))",
    "Count(Not(Row(f=1)))",
    "TopN(f, n=2)",
    "Sum(field=v)",
    "Min(field=v)",
    "Max(field=v)",
    "Count(Row(v > 6))",
    "Count(Distinct(field=v))",
    "GroupBy(Rows(f))",
    "GroupBy(Rows(f), aggregate=Sum(field=v))",
    "Rows(f)",
    "Percentile(field=v, nth=50)",
    "Extract(Row(f=1), Rows(f))",
    "Sort(All(), field=v, limit=3)",
    "MinRow(field=f)",
    "MaxRow(field=f)",
]


def seed(api_like, via_http=None):
    """Create schema + data either directly on an API or over HTTP."""
    if via_http is None:
        api_like.create_index("i", {"trackExistence": True})
        api_like.create_field("i", "f", {"type": "set"})
        api_like.create_field("i", "v", {"type": "int"})
        api_like.import_bits("i", "f", ROWS, COLS)
        api_like.import_values("i", "v", COLS, VALS)
    else:
        tc, n = api_like, via_http
        tc.http(n, "POST", "/index/i",
                {"options": {"trackExistence": True}})
        tc.http(n, "POST", "/index/i/field/f", {"options": {"type": "set"}})
        tc.http(n, "POST", "/index/i/field/v", {"options": {"type": "int"}})
        tc.http(n, "POST", "/index/i/field/f/import",
                {"rowIDs": ROWS, "columnIDs": COLS})
        tc.http(n, "POST", "/index/i/field/v/import",
                {"columnIDs": COLS, "values": VALS})


@pytest.fixture(scope="module")
def oracle():
    api = API()
    seed(api)
    return api


class TestTopology:
    def make_snap(self, n=3, replicas=2):
        return ClusterSnapshot(
            [Node(f"node{i}", f"http://127.0.0.1:{10000+i}")
             for i in range(n)], replicas=replicas)

    def test_every_node_computes_identical_placement(self):
        a, b = self.make_snap(), self.make_snap()
        for s in range(64):
            assert [n.id for n in a.shard_nodes("i", s)] == \
                [n.id for n in b.shard_nodes("i", s)]

    def test_replicas_are_distinct_consecutive_nodes(self):
        snap = self.make_snap(n=4, replicas=3)
        for s in range(32):
            owners = [n.id for n in snap.shard_nodes("i", s)]
            assert len(owners) == 3
            assert len(set(owners)) == 3

    def test_shards_spread_across_nodes(self):
        snap = self.make_snap(n=3, replicas=1)
        primaries = {snap.shard_nodes("i", s)[0].id for s in range(64)}
        assert len(primaries) == 3  # jump hash spreads partitions

    def test_key_partition_primary_is_stable(self):
        snap = self.make_snap()
        assert snap.primary_key_node("i", "abc").id == \
            snap.primary_key_node("i", "abc").id
        assert snap.primary_field_translation_node() is not None

    def test_cluster_state(self):
        snap = self.make_snap(n=3, replicas=2)
        assert snap.state() == "NORMAL"
        snap.nodes[1].state = "DOWN"
        assert snap.state() == "DEGRADED"
        snap.nodes[2].state = "DOWN"
        assert snap.state() == "DOWN"


class TestDistributedQueries:
    @pytest.fixture(scope="class")
    def cluster(self):
        with TestCluster(3) as tc:
            seed(tc, via_http=0)
            yield tc

    def test_schema_broadcast(self, cluster):
        for i in range(3):
            schema = cluster.http(i, "GET", "/schema")["indexes"]
            names = {f["name"] for f in schema[0]["fields"]}
            assert {"f", "v"} <= names

    def test_data_is_distributed(self, cluster):
        # at least two nodes hold some shard of i locally
        holders = sum(
            1 for api in cluster.apis
            if api.holder.index("i").available_shards())
        assert holders >= 2

    @pytest.mark.parametrize("pql", QUERIES)
    def test_parity_with_single_node(self, cluster, oracle, pql):
        want = response_to_json(oracle.query("i", pql))
        for n in range(3):
            got = cluster.query(n, "i", pql)
            assert got == want, f"node{n} {pql}: {got} != {want}"

    def test_writes_from_any_node(self, cluster, oracle):
        col = 7 * SHARD_WIDTH + 11
        cluster.query(1, "i", f"Set({col}, f=9)")
        oracle.query("i", f"Set({col}, f=9)")
        for n in range(3):
            assert cluster.query(n, "i", "Count(Row(f=9))") == \
                {"results": [1]}
        # clear it back
        cluster.query(2, "i", f"Clear({col}, f=9)")
        oracle.query("i", f"Clear({col}, f=9)")
        assert cluster.query(0, "i", "Count(Row(f=9))") == {"results": [0]}

    def test_nested_precall_distinct_filter(self, cluster, oracle):
        pql = "Count(Intersect(Row(f=1), Distinct(field=f)))"
        want = response_to_json(oracle.query("i", pql))
        assert cluster.query(1, "i", pql) == want


class TestKeyedCluster:
    @pytest.fixture(scope="class")
    def cluster(self):
        with TestCluster(3) as tc:
            tc.http(0, "POST", "/index/k", {"options": {"keys": True}})
            tc.http(0, "POST", "/index/k/field/tag",
                    {"options": {"type": "set", "keys": True}})
            tc.http(1, "POST", "/index/k/field/tag/import",
                    {"rowKeys": ["red", "blue", "red", "green"],
                     "columnKeys": ["a", "b", "c", "d"]})
            yield tc

    def test_keys_replicated_to_all_nodes(self, cluster):
        for api in cluster.apis:
            store = api.holder.index("k").translate_store
            found = store.find_keys(["a", "b", "c", "d"])
            assert len(found) == 4

    def test_query_by_key_from_any_node(self, cluster):
        for n in range(3):
            got = cluster.query(n, "k", 'Count(Row(tag="red"))')
            assert got == {"results": [2]}

    def test_row_result_translates_to_keys(self, cluster):
        got = cluster.query(2, "k", 'Row(tag="red")')
        assert sorted(got["results"][0]["keys"]) == ["a", "c"]

    def test_topn_returns_keys(self, cluster):
        got = cluster.query(1, "k", "TopN(tag, n=1)")
        assert got["results"][0]["pairs"][0]["key"] == "red"

    def test_pql_set_with_keys(self, cluster):
        cluster.query(2, "k", 'Set("zzz", tag="purple")')
        for n in range(3):
            assert cluster.query(n, "k", 'Count(Row(tag="purple"))') == \
                {"results": [1]}


class TestReplicationFailover:
    def test_read_failover_with_replicas(self):
        with TestCluster(3, replicas=2) as tc:
            seed(tc, via_http=0)
            want = tc.query(0, "i", "Count(Row(f=1))")
            assert want == {"results": [3]}
            # kill a non-coordinator node; reads must still succeed via
            # replicas (reference: executor.go:6503 failover;
            # TestPauseReplica)
            tc.stop_node(2)
            for n in (0, 1):
                got = tc.query(n, "i", "Count(Row(f=1))")
                assert got == {"results": [3]}
            got = tc.query(0, "i", "Sum(field=v)")
            assert got["results"][0]["value"] == sum(VALS)

    def test_no_replica_means_missing_shards_error(self):
        with TestCluster(2, replicas=1) as tc:
            tc.http(0, "POST", "/index/i", {"options": {}})
            tc.http(0, "POST", "/index/i/field/f",
                    {"options": {"type": "set"}})
            # place a bit in a shard owned (solely) by node1
            snap = tc.apis[0].cluster.snapshot
            shard = next(s for s in range(64)
                         if snap.shard_nodes("i", s)[0].id == "node1")
            tc.query(0, "i", f"Set({shard * SHARD_WIDTH + 1}, f=1)")
            tc.stop_node(1)
            import urllib.error
            with pytest.raises(urllib.error.HTTPError):
                tc.query(0, "i", "Count(Row(f=1))")


class TestConcurrentFanout:
    def test_fanout_runs_nodes_in_parallel(self, monkeypatch):
        """The scatter phase must query all owner nodes concurrently
        (reference: executor.go:6579 mapper, one goroutine per node);
        a 3-node query with a per-node delay D must finish in ~D, not 3D."""
        import threading
        import time

        from featurebase_tpu.cluster.distributed import DistributedExecutor

        with TestCluster(3, replicas=1) as tc:
            seed(tc[0])
            # warm the jit caches so the timed run measures fan-out only
            assert tc.query(0, "i", "Count(Row(f=1))") == {"results": [3]}
            orig = DistributedExecutor._exec_on_node
            delay = 0.25
            seen_nodes = set()

            def slow(self, node, index_name, call, shards):
                seen_nodes.add(node.id)
                time.sleep(delay)
                return orig(self, node, index_name, call, shards)

            monkeypatch.setattr(DistributedExecutor, "_exec_on_node", slow)
            t0 = time.perf_counter()
            got = tc.query(0, "i", "Count(Row(f=1))")
            dt = time.perf_counter() - t0
            assert got == {"results": [3]}
            assert len(seen_nodes) >= 2  # the query really fanned out
            # sequential would cost len(seen_nodes) * delay
            assert dt < len(seen_nodes) * delay, \
                f"fan-out looks sequential: {dt:.2f}s over {seen_nodes}"


class TestClusterStatus:
    def test_status_reports_nodes(self):
        with TestCluster(2) as tc:
            st = tc.http(0, "GET", "/status")
            assert st["nodeID"] == "node0"
            assert len(st["nodes"]) == 2
            assert st["state"] == "NORMAL"


class TestUnlimitedSortStreaming:
    def test_unlimited_sort_streams_in_pages(self, monkeypatch):
        """Unlimited distributed Sort ships bounded pages per node and
        merges runs at the coordinator (r3 weak #9) — results identical
        to the single-node oracle, with multiple pages actually fetched."""
        from featurebase_tpu.cluster.distributed import DistributedExecutor
        monkeypatch.setattr(DistributedExecutor, "SORT_STREAM_CHUNK", 3)
        calls = {"n": 0}
        real = DistributedExecutor._exec_on_node

        def spy(self, node, index_name, call, shards):
            if call.name == "Sort":
                calls["n"] += 1
            return real(self, node, index_name, call, shards)

        monkeypatch.setattr(DistributedExecutor, "_exec_on_node", spy)
        with TestCluster(2) as tc:
            seed(tc[0])
            oracle = API()
            seed(oracle)
            want = response_to_json(
                oracle.query("i", "Sort(All(), field=v)"))
            got = response_to_json(tc[1].query("i", "Sort(All(), field=v)"))
            assert got == want
            assert len(want["results"][0]["columns"]) == len(COLS)
            # 8 records over 2 nodes with 3-row pages: > one page request
            assert calls["n"] >= 3
            # limited path unaffected (per-node pushdown)
            want_l = response_to_json(
                oracle.query("i", "Sort(All(), field=v, limit=3, offset=1)"))
            got_l = response_to_json(
                tc[1].query("i", "Sort(All(), field=v, limit=3, offset=1)"))
            assert got_l == want_l

    def test_keyset_pages_stable_under_concurrent_writes(self, monkeypatch):
        """A write landing BETWEEN pages must not duplicate or drop
        records: pages resume by (value, column) keyset cursor, not
        offset, so a newly inserted low value cannot shift the order
        under the stream (ADVICE r4 #4)."""
        from featurebase_tpu.cluster.distributed import DistributedExecutor
        monkeypatch.setattr(DistributedExecutor, "SORT_STREAM_CHUNK", 3)
        real = DistributedExecutor._exec_on_node
        state = {"pages": 0, "tc": None}

        def inject(self, node, index_name, call, shards):
            out = real(self, node, index_name, call, shards)
            if call.name == "Sort":
                state["pages"] += 1
                if state["pages"] == 1 and state["tc"] is not None:
                    # low value sorts BEFORE every cursor: offset
                    # pagination would shift the node's pages by one
                    state["tc"][0].import_values(
                        "i", "v", [7 * SHARD_WIDTH + 11], [-1000])
                    state["tc"][0].import_bits(
                        "i", "f", [1], [7 * SHARD_WIDTH + 11])
            return out

        monkeypatch.setattr(DistributedExecutor, "_exec_on_node", inject)
        with TestCluster(2) as tc:
            seed(tc[0])
            state["tc"] = tc
            got = response_to_json(tc[1].query("i", "Sort(All(), field=v)"))
            cols = got["results"][0]["columns"]
            assert len(cols) == len(set(cols)), "duplicate records in stream"
            assert set(COLS) <= set(cols), "seeded records dropped"
