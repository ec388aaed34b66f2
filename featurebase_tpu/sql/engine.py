"""SQL engine entry point (reference: sql3/ parser+planner, 67K LoC).

Round-1 scope: a SQL subset that lowers to the PQL plan layer —
SELECT with WHERE on fields, COUNT(*)/SUM/MIN/MAX aggregates, GROUP BY,
DISTINCT, LIMIT; DDL (CREATE/DROP TABLE, CREATE/DROP FIELD via typed
columns); INSERT.  Grows toward the reference's sql3 coverage in later
rounds.  See featurebase_tpu/sql/parser.py and planner.py.
"""
from __future__ import annotations

from featurebase_tpu.server.api import API, APIError


def execute_sql(api: API, sql: str) -> dict:
    from featurebase_tpu.sql.planner import plan_and_execute
    try:
        return plan_and_execute(api, sql)
    except APIError:
        raise
    except NotImplementedError as e:
        raise APIError(f"SQL not supported yet: {e}", 400)
