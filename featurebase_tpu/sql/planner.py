"""SQL planner: lowers parsed SQL onto the PQL executor.

Mirrors the reference's sql3 planner lowering rules (reference:
sql3/planner/planoptimizer.go:86 — filter pushdown into PQL scans:501,
GroupBy->PQLGroupBy/PQLAggregate:661,876, Distinct->PQLDistinct:753,
top pushdown:980): WHERE expressions compile to PQL bitmap call trees,
aggregates to Sum/Min/Max/Count calls, GROUP BY to GroupBy(Rows(...)),
projections to Extract.

Table <-> index type mapping (reference sql3 data types, astdatatype.go):
  ID -> mutex | STRING -> mutex keyed | IDSET -> set | STRINGSET -> set keyed
  INT min max -> int | DECIMAL(s) -> decimal | TIMESTAMP -> timestamp
  BOOL -> bool.  A table whose _id is STRING maps to a keyed index.
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional

import numpy as np

from featurebase_tpu.executor.results import GroupCount, ValCount
from featurebase_tpu.model.row import Row, SignedRow
from featurebase_tpu.pql.ast import Call, Condition
from featurebase_tpu.server.api import API, APIError
from featurebase_tpu.sql.parser import (Between, Cmp, CreateTable, Delete,
                                        DropTable, InList, Insert, IsNull,
                                        Logical, Select, Show, SQLError,
                                        parse_sql)

_TYPE_TO_FIELD = {
    "id": {"type": "mutex"},
    "string": {"type": "mutex", "keys": True},
    "idset": {"type": "set"},
    "stringset": {"type": "set", "keys": True},
    "int": {"type": "int"},
    "decimal": {"type": "decimal"},
    "timestamp": {"type": "timestamp"},
    "bool": {"type": "bool"},
}


def plan_and_execute(api: API, sql: str) -> dict:
    try:
        stmts = parse_sql(sql)
    except SQLError as e:
        raise APIError(f"SQL parse error: {e}", 400)
    out = None
    for stmt in stmts:
        out = _execute_stmt(api, stmt)
    return out if out is not None else {"schema": {"fields": []}, "data": []}


def _execute_stmt(api: API, stmt) -> dict:
    if isinstance(stmt, CreateTable):
        return _create_table(api, stmt)
    if isinstance(stmt, DropTable):
        api.delete_index(stmt.name)
        return _ok()
    if isinstance(stmt, Show):
        return _show(api, stmt)
    if isinstance(stmt, Insert):
        return _insert(api, stmt)
    if isinstance(stmt, Delete):
        return _delete(api, stmt)
    if isinstance(stmt, Select):
        return _select(api, stmt)
    raise APIError(f"unsupported statement {type(stmt).__name__}", 400)


def _ok() -> dict:
    return {"schema": {"fields": []}, "data": []}


def _create_table(api: API, stmt: CreateTable) -> dict:
    keyed = False
    for name, typ, _ in stmt.columns:
        if name == "_id" and typ == "string":
            keyed = True
    api.create_index(stmt.name, {"keys": keyed},
                     if_not_exists=stmt.if_not_exists)
    for name, typ, opts in stmt.columns:
        if name == "_id":
            continue
        fo = dict(_TYPE_TO_FIELD.get(typ, {"type": typ}))
        if "min" in opts:
            fo["min"] = int(opts["min"])
        if "max" in opts:
            fo["max"] = int(opts["max"])
        if "scale" in opts:
            fo["scale"] = int(opts["scale"])
        if "timeunit" in opts:
            fo["timeUnit"] = str(opts["timeunit"])
        if "timequantum" in opts:
            fo["timeQuantum"] = str(opts["timequantum"])
            fo["type"] = "time"
        api.create_field(stmt.name, name, fo, if_not_exists=stmt.if_not_exists)
    return _ok()


def _show(api: API, stmt: Show) -> dict:
    if stmt.what == "tables":
        return {
            "schema": {"fields": [{"name": "name", "type": "string"}]},
            "data": [[n] for n in sorted(api.holder.indexes)],
        }
    idx = api.holder.index(stmt.table)
    if idx is None:
        raise APIError(f"table not found: {stmt.table}", 404)
    return {
        "schema": {"fields": [{"name": "name", "type": "string"},
                              {"name": "type", "type": "string"}]},
        "data": [[f.name, f.options.type] for f in idx.public_fields()],
    }


def _insert(api: API, stmt: Insert) -> dict:
    idx = api.holder.index(stmt.table)
    if idx is None:
        raise APIError(f"table not found: {stmt.table}", 404)
    cols = stmt.columns or ["_id"] + [f.name for f in idx.public_fields()]
    if "_id" not in cols:
        raise APIError("INSERT requires _id column", 400)
    id_pos = cols.index("_id")
    for row in stmt.rows:
        if len(row) != len(cols):
            raise APIError("INSERT row arity mismatch", 400)
        rid = row[id_pos]
        if isinstance(rid, str):
            rid = idx.translate_store.create_keys([rid])[rid]
        rid = int(rid)
        for ci, cname in enumerate(cols):
            if cname == "_id":
                continue
            val = row[ci]
            if val is None:
                continue
            f = idx.field(cname)
            if f is None:
                raise APIError(f"column not found: {cname}", 400)
            vals = val if isinstance(val, list) else [val]
            for v in vals:
                if f.is_bsi():
                    f.set_value(rid, v)
                elif f.options.type == "bool":
                    f.set_bit(1 if v in (True, 1, "true") else 0, rid)
                else:
                    if isinstance(v, str):
                        store = idx.row_translation(cname)
                        if store is None:
                            raise APIError(
                                f"column {cname} does not accept strings", 400)
                        v = store.create_keys([v])[v]
                    f.set_bit(int(v), rid)
        idx.mark_exists(np.array([rid]))
    return _ok()


def _delete(api: API, stmt: Delete) -> dict:
    filt = _where_to_call(api, stmt.table, stmt.where) if stmt.where \
        else Call("All")
    api.executor.execute(stmt.table, _pql_query([Call("Delete",
                                                      children=[filt])]))
    return _ok()


def _pql_query(calls: List[Call]):
    from featurebase_tpu.pql.ast import Query
    return Query(calls)


# -- WHERE compilation ------------------------------------------------------

def _where_to_call(api: API, table: str, node) -> Call:
    idx = api.holder.index(table)
    if idx is None:
        raise APIError(f"table not found: {table}", 404)

    def field_of(col: str):
        f = idx.field(col)
        if f is None:
            raise APIError(f"column not found: {col}", 400)
        return f

    def rec(n) -> Call:
        if isinstance(n, Logical):
            if n.op == "and":
                return Call("Intersect", children=[rec(a) for a in n.args])
            if n.op == "or":
                return Call("Union", children=[rec(a) for a in n.args])
            return Call("Not", children=[rec(n.args[0])])
        if isinstance(n, Cmp):
            f = field_of(n.col)
            v = n.value
            if f.is_bsi():
                if n.op == "=":
                    return Call("Row", {n.col: Condition("==", v)})
                return Call("Row", {n.col: Condition(n.op, v)})
            if n.op == "=":
                if f.options.type == "bool":
                    v = 1 if v in (True, 1, "true") else 0
                return Call("Row", {n.col: v})
            if n.op == "!=":
                return Call("Not", children=[Call("Row", {n.col: v})])
            raise APIError(f"operator {n.op} needs an int-like column", 400)
        if isinstance(n, Between):
            return Call("Row", {n.col: Condition("betw", [n.lo, n.hi])})
        if isinstance(n, InList):
            f = field_of(n.col)
            if f.is_bsi():
                return Call("Union", children=[
                    Call("Row", {n.col: Condition("==", v)})
                    for v in n.values])
            return Call("Union", children=[Call("Row", {n.col: v})
                                           for v in n.values])
        if isinstance(n, IsNull):
            f = field_of(n.col)
            if n.negated:
                return Call("Row", {n.col: Condition("!=", None)})
            return Call("Row", {n.col: Condition("==", None)})
        raise APIError(f"unsupported WHERE node {type(n).__name__}", 400)

    return rec(node)


# -- SELECT -----------------------------------------------------------------

def _select(api: API, stmt: Select) -> dict:
    idx = api.holder.index(stmt.table)
    if idx is None:
        raise APIError(f"table not found: {stmt.table}", 404)
    filt = _where_to_call(api, stmt.table, stmt.where) if stmt.where \
        else Call("All")

    agg_kinds = [c for c in stmt.columns if c[0] in
                 ("count", "sum", "min", "max", "avg")]

    # GROUP BY path (reference: GroupBy -> PQLGroupBy lowering)
    if stmt.group_by:
        rows_calls = [Call("Rows", {"_field": g}) for g in stmt.group_by]
        args: Dict[str, Any] = {}
        agg_out = None
        for kind, col, distinct in agg_kinds:
            if kind == "sum":
                args["aggregate"] = Call("Sum", {"_field": col})
                agg_out = "sum"
            elif kind == "count" and col is None:
                pass
        if stmt.where:
            args["filter"] = filt
        if stmt.limit is not None and not stmt.having:
            args["limit"] = stmt.limit
        gb = Call("GroupBy", args, children=rows_calls)
        (groups,) = api.executor.execute(stmt.table, _pql_query([gb]))
        fields = [{"name": g, "type": "string"} for g in stmt.group_by]
        data = []
        for gc in groups:
            key = [fr.row_key if fr.row_key is not None else fr.row_id
                   for fr in gc.group]
            rowvals = list(key)
            for kind, col, distinct in agg_kinds:
                if kind == "count":
                    rowvals.append(gc.count)
                elif kind == "sum":
                    rowvals.append(gc.decimal_agg if gc.decimal_agg is not None
                                   else gc.agg)
                elif kind == "avg":
                    rowvals.append(gc.agg / gc.count if gc.count else None)
            data.append(rowvals)
        for kind, col, _ in agg_kinds:
            fields.append({"name": f"{kind}({col or '*'})", "type": "int"})
        if stmt.having is not None:
            data = _apply_having_rows(stmt, fields, data)
        if stmt.limit is not None:
            data = data[stmt.offset: stmt.offset + stmt.limit]
        return {"schema": {"fields": fields}, "data": data}

    # pure aggregates
    if agg_kinds:
        fields = []
        vals = []
        for kind, col, distinct in agg_kinds:
            if kind == "count":
                if distinct and col:
                    c = Call("Count", children=[
                        Call("Distinct", {"_field": col}, children=(
                            [filt] if stmt.where else []))])
                elif stmt.where:
                    c = Call("Count", children=[filt])
                else:
                    c = Call("Count", children=[Call("All")])
                (v,) = api.executor.execute(stmt.table, _pql_query([c]))
                vals.append(int(v))
            elif kind in ("sum", "min", "max", "avg"):
                name = {"sum": "Sum", "min": "Min", "max": "Max",
                        "avg": "Sum"}[kind]
                c = Call(name, {"_field": col},
                         children=([filt] if stmt.where else []))
                (vc,) = api.executor.execute(stmt.table, _pql_query([c]))
                if kind == "avg":
                    vals.append(vc.val / vc.count if vc.count else None)
                elif vc.float_val is not None:
                    vals.append(vc.float_val)
                else:
                    vals.append(vc.val)
            fields.append({"name": f"{kind}({col or '*'})", "type": "int"})
        return {"schema": {"fields": fields}, "data": [vals]}

    # projection path -> Extract
    proj_cols = [c[1] for c in stmt.columns if c[0] == "col"]
    star = any(c[0] == "star" for c in stmt.columns)
    if star:
        proj_cols = [f.name for f in idx.public_fields()]
    id_only = proj_cols == ["_id"]
    proj_fields = [c for c in proj_cols if c != "_id"]

    if id_only:
        (row,) = api.executor.execute(stmt.table, _pql_query([filt]))
        ids = row.keys if row.keys is not None else \
            [int(c) for c in row.columns()]
        data = [[i] for i in ids]
        if stmt.limit is not None:
            data = data[stmt.offset: stmt.offset + stmt.limit]
        return {"schema": {"fields": [{"name": "_id", "type": "id"}]},
                "data": data}

    ext = Call("Extract", children=[filt] + [Call("Rows", {"_field": c})
                                             for c in proj_fields])
    (tbl,) = api.executor.execute(stmt.table, _pql_query([ext]))
    fields = [{"name": "_id", "type": "id"}] if star or "_id" in proj_cols \
        else []
    fields += [{"name": f.name, "type": f.type} for f in tbl.fields]
    data = []
    for colrec in tbl.columns:
        rowvals = []
        if fields and fields[0]["name"] == "_id":
            rowvals.append(colrec.column)
        for fi, f in enumerate(tbl.fields):
            v = colrec.rows[fi]
            if f.type in ("id", "string", "bool") and not isinstance(v, list):
                rowvals.append(v)
            elif f.type.startswith("[]"):
                rowvals.append(v)
            else:
                rowvals.append(v)
        data.append(rowvals)
    if stmt.order_by:
        names = [f["name"] for f in fields]
        for col, desc in reversed(stmt.order_by):
            if col in names:
                k = names.index(col)
                data.sort(key=lambda r: (r[k] is None, r[k]), reverse=desc)
    if stmt.limit is not None:
        data = data[stmt.offset: stmt.offset + stmt.limit]
    return {"schema": {"fields": fields}, "data": data}


def _apply_having_rows(stmt, fields, data):
    """Very small HAVING support: count(*)/sum(col) comparisons."""
    names = [f["name"] for f in fields]

    def match(row, node) -> bool:
        if isinstance(node, Logical):
            if node.op == "and":
                return all(match(row, a) for a in node.args)
            if node.op == "or":
                return any(match(row, a) for a in node.args)
            return not match(row, node.args[0])
        if isinstance(node, Cmp):
            tgt = None
            for i, n in enumerate(names):
                if n.startswith(node.col) or n == f"count(*)" and \
                        node.col == "count":
                    tgt = i
            if tgt is None:
                for i, n in enumerate(names):
                    if node.col in n:
                        tgt = i
            if tgt is None:
                raise APIError(f"HAVING column not found: {node.col}", 400)
            v = row[tgt]
            ops = {"=": lambda a, b: a == b, "!=": lambda a, b: a != b,
                   "<": lambda a, b: a < b, "<=": lambda a, b: a <= b,
                   ">": lambda a, b: a > b, ">=": lambda a, b: a >= b}
            return ops[node.op](v, node.value)
        raise APIError("unsupported HAVING expression", 400)

    return [r for r in data if match(r, stmt.having)]
