"""Physical-plan inspection helpers.

The engine's scale discipline — filters pushed to the scan, narrow read
schemas, broadcast dimension joins, top-k without global sort, bounded
shuffle counts — is *asserted* by tests using these helpers, so a plan
regression fails CI rather than shipping a 100 TB surprise.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges in the physical plan (AQE may later
    coalesce partitions but the exchange boundaries are decided here).
    Broadcast exchanges are excluded — they're the cheap kind."""
    plan = explain_str(df, "simple")
    return len(re.findall(r"Exchange (?!SinglePartition)(?:hashpartitioning|rangepartitioning|RoundRobinPartitioning)", plan))


def has_pushed_filters(df: DataFrame, *fragments: str) -> bool:
    """True if the formatted plan shows a non-empty PushedFilters list
    containing every given fragment (column names, usually)."""
    plan = explain_str(df, "formatted")
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    joined = "; ".join(pushed)
    if not joined.strip():
        return False
    return all(f in joined for f in fragments)


def scan_schema_columns(df: DataFrame, table_hint: str | None = None) -> list[str]:
    """Columns actually read by the (first matching) Parquet scan —
    verifies column pruning reached the reader."""
    plan = explain_str(df, "formatted")
    scans = re.split(r"\(\d+\) Scan parquet", plan)[1:]
    for scan in scans:
        if table_hint and table_hint not in scan.split("ReadSchema:")[0]:
            continue
        m = re.search(r"ReadSchema: struct<([^>]*)>", scan)
        if m:
            return [c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()]
    return []


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df, "simple")


def uses_take_ordered(df: DataFrame) -> bool:
    return "TakeOrderedAndProject" in explain_str(df, "simple")
