"""SQL system tables (reference: sql3/planner/executionplannersystemtables.go,
opsystemtable.go — fb_table_info, fb_database_info, fb_views,
fb_exec_requests, fb_version, fb_cluster_info, fb_cluster_nodes)."""
from __future__ import annotations

from typing import List, Tuple

SYSTEM_TABLES = {"fb_version", "fb_database_info", "fb_table_info",
                 "fb_table_columns", "fb_views", "fb_cluster_info",
                 "fb_cluster_nodes", "fb_exec_requests"}


def is_system_table(name: str) -> bool:
    return name.lower() in SYSTEM_TABLES


def run_system_table(api, name: str) -> Tuple[List[Tuple[str, str]], list]:
    name = name.lower()
    if name == "fb_version":
        from featurebase_tpu import __version__
        return [("version", "string")], [[__version__]]
    if name == "fb_database_info":
        return ([("name", "string"), ("platform", "string"),
                 ("shard_width", "int")],
                [["featurebase_tpu", "tpu", 1 << 20]])
    if name == "fb_table_info":
        rows = []
        for n in sorted(api.holder.indexes):
            idx = api.holder.index(n)
            rows.append([n, idx.options.keys,
                         len(idx.public_fields()),
                         len(idx.available_shards())])
        return [("name", "string"), ("keys", "bool"),
                ("column_count", "int"), ("shard_count", "int")], rows
    if name == "fb_table_columns":
        rows = []
        for n in sorted(api.holder.indexes):
            idx = api.holder.index(n)
            for f in idx.public_fields():
                rows.append([n, f.name, f.options.type, f.options.keys])
        return [("table", "string"), ("name", "string"),
                ("type", "string"), ("keys", "bool")], rows
    if name == "fb_views":
        rows = [[vn, sql] for vn, sql in
                sorted(getattr(api.holder, "sql_views", {}).items())]
        return [("name", "string"), ("statement", "string")], rows
    if name == "fb_cluster_info":
        if api.cluster is not None:
            snap = api.cluster.snapshot
            return ([("state", "string"), ("node_count", "int"),
                     ("replica_count", "int")],
                    [[snap.state(), len(snap.nodes), snap.replicas]])
        return ([("state", "string"), ("node_count", "int"),
                 ("replica_count", "int")], [["NORMAL", 1, 1]])
    if name == "fb_cluster_nodes":
        if api.cluster is not None:
            return ([("id", "string"), ("uri", "string"),
                     ("state", "string"), ("is_primary", "bool")],
                    [[n.id, n.uri, n.state, n.is_primary]
                     for n in api.cluster.nodes])
        return [("id", "string"), ("uri", "string"), ("state", "string"),
                ("is_primary", "bool")], [["node0", "", "STARTED", True]]
    if name == "fb_exec_requests":
        reqs = getattr(api, "exec_requests", None)
        rows = reqs.rows() if reqs is not None else []
        return [("request_id", "string"), ("sql", "string"),
                ("status", "string"), ("elapsed_ms", "int")], rows
    raise KeyError(name)
