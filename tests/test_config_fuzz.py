"""Config-fuzz matrix gate: correctness must be configuration-independent.

Round 4 found a whole hazard class late (29 money aggregates green at
sf<=0.1 only by summation-order luck) because results were only ever
checked under ONE session configuration. This gate runs a representative
query set — one per known hazard class plus the new distributed-ranking
surface — under a pairwise-covering matrix of the three execution knobs
that change physical merge structure:

- ``spark.sql.shuffle.partitions`` in {7, 33}: partial-aggregate fan-in
  and range-partitioner bucket count (the "how many CPUs" proxy — thread
  count itself cannot change results, partition counts can);
- ``spark.sql.files.maxPartitionBytes`` in {64k, default}: scan split
  count, hence partial-agg grouping of input rows;
- ``spark.sql.adaptive.enabled`` on/off: runtime re-planning (coalesced
  shuffles, AQE-converted joins).

Every (dimension, value) pair appears in at least one of the four matrix
cells (pairwise covering), and every cell's result must equal the DuckDB
twin bit-for-bit at sf0.001 — the exact compare the driver runs. The
twin is evaluated once per query; Spark re-runs per cell. Budget: the
whole module is a per-commit gate and must stay under ~2 minutes.
"""

from __future__ import annotations

import math
from functools import lru_cache

import pytest

from nosql_based_business_intelligence_system_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"

#: One query per hazard class (see PLANS.md config-robustness notes):
#: decimal money sums, float means, star-join money, Spark-replica
#: percentiles, global-window money running sums, distributed ntile
#: (range-partitioner + offsets), distributed percent_rank ($bucketAuto).
REPRESENTATIVES = (
    "pricing_summary",
    "embedding_norm_stats",
    "sales_by_fiscal_month",
    "order_value_percentiles",
    "monthly_revenue_running",
    "customer_value_deciles",
    "mongo_order_value_bucket_auto",
)

#: Pairwise-covering cells over (shuffle partitions, split bytes, AQE).
MATRIX = (
    {"parts": "7", "split": "64k", "aqe": "false"},
    {"parts": "7", "split": None, "aqe": "true"},
    {"parts": "33", "split": "64k", "aqe": "true"},
    {"parts": "33", "split": None, "aqe": "false"},
)


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0:
            return "0"
        return repr(v)
    return v


def _table(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


@lru_cache(maxsize=None)
def _oracle(name):
    import duckdb

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF}/{t}.parquet')"
        )
    cur = con.execute(QUERIES[name].oracle)
    return _table(cur.fetchall(), [d[0] for d in cur.description])


@pytest.mark.parametrize(
    "cell", MATRIX, ids=[f"p{c['parts']}-s{c['split']}-aqe{c['aqe']}" for c in MATRIX]
)
def test_matrix_cell_matches_twin(spark, cell):
    saved = {
        "spark.sql.shuffle.partitions": spark.conf.get(
            "spark.sql.shuffle.partitions"
        ),
        "spark.sql.files.maxPartitionBytes": spark.conf.get(
            "spark.sql.files.maxPartitionBytes"
        ),
        "spark.sql.files.openCostInBytes": spark.conf.get(
            "spark.sql.files.openCostInBytes", "4194304"
        ),
        "spark.sql.adaptive.enabled": spark.conf.get(
            "spark.sql.adaptive.enabled"
        ),
    }
    spark.conf.set("spark.sql.shuffle.partitions", cell["parts"])
    spark.conf.set("spark.sql.adaptive.enabled", cell["aqe"])
    if cell["split"]:
        spark.conf.set("spark.sql.files.maxPartitionBytes", cell["split"])
        spark.conf.set("spark.sql.files.openCostInBytes", "0")
    try:
        for name in REPRESENTATIVES:
            q = QUERIES[name]
            assert q.oracle is not None, f"{name} lost its oracle"
            sdf = q.fn(spark, SF)
            got = _table([tuple(r) for r in sdf.collect()], sdf.columns)
            assert got == _oracle(name), (name, cell)
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
