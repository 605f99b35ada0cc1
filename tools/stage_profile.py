"""Per-stage profile of one registry query: wall + the Spark UI REST
stage table (task counts, executor run time, input / shuffle bytes).

Usage: python tools/stage_profile.py <sf_dir> <query> [mem]

This is the adjudication tool the r10-r12 perf verdicts kept asking for:
a stage table that SUMS to the observed wall (executorRunTime/cores ~
wall per stage), so an expensive query's floor is attributable instead
of folklore. One warmup execution, then one profiled execution on a
quiet session; stages from the profiled execution only.

r13: each stage row also carries its own WALL (submissionTime ->
completionTime) and the max/median task duration from the taskSummary
endpoint — the §2.2/§2.5 skew instrument: a stage whose wall is ~2x
executorRunTime/cores with max/median >> 1 is straggler-bound, while
an even stage with the same gap is scheduling/overlap-bound.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1]
    name = sys.argv[2]
    if len(sys.argv) > 3:
        os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", sys.argv[3])

    from nosql_based_business_intelligence_system_spark.caching import free_blocks
    from nosql_based_business_intelligence_system_spark.queries import QUERIES
    from nosql_based_business_intelligence_system_spark.session import get_spark

    spark = get_spark(app_name="stage_profile")
    spark.sparkContext.setLogLevel("ERROR")
    q = QUERIES[name]
    q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
    free_blocks(spark)
    spark.range(1000).count()
    time.sleep(0.5)

    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId

    def stages():
        with urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app}/stages"
        ) as r:
            return json.load(r)

    if not ui:
        print("Spark UI disabled; cannot profile", file=sys.stderr)
        return 1
    since = max((s["stageId"] for s in stages()), default=-1)
    t0 = time.time()
    q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    wall = time.time() - t0

    def task_quants(stage_id: int, attempt: int) -> tuple[float, float]:
        """(median, max) task duration seconds from the taskSummary
        endpoint; (0, 0) when the endpoint has no data (0-task stages)."""
        try:
            with urllib.request.urlopen(
                f"{ui}/api/v1/applications/{app}/stages/{stage_id}/"
                f"{attempt}/taskSummary?quantiles=0.5,1.0"
            ) as r:
                t = json.load(r)["duration"]
                return t[0] / 1000, t[1] / 1000
        except Exception:
            return 0.0, 0.0

    def iso_ms(s: str) -> float:
        # "2026-08-18T12:00:00.123GMT" -> epoch seconds
        from datetime import datetime, timezone

        return (
            datetime.strptime(s[:23], "%Y-%m-%dT%H:%M:%S.%f")
            .replace(tzinfo=timezone.utc)
            .timestamp()
        )

    rows = []
    total_rt = 0.0
    for s in stages():
        if s.get("status") != "COMPLETE" or s["stageId"] <= since:
            continue
        rt = s["executorRunTime"] / 1000
        total_rt += rt
        try:
            st_wall = iso_ms(s["completionTime"]) - iso_ms(s["submissionTime"])
        except (KeyError, ValueError):
            st_wall = 0.0
        med, mx = task_quants(s["stageId"], s.get("attemptId", 0))
        rows.append(
            (
                s["stageId"],
                s["numCompleteTasks"],
                round(rt, 1),
                round(st_wall, 1),
                round(med, 1),
                round(mx, 1),
                round(s.get("inputBytes", 0) / 1e6, 1),
                round(s.get("shuffleReadBytes", 0) / 1e6, 1),
                round(s.get("shuffleWriteBytes", 0) / 1e6, 1),
                round(s.get("memoryBytesSpilled", 0) / 1e6, 1),
                round(s.get("diskBytesSpilled", 0) / 1e6, 1),
                s["name"].split(" at ")[0][:40],
            )
        )
    cores = spark.sparkContext.defaultParallelism
    print(f"{name} @ {sf_dir}: wall {wall:.2f}s, "
          f"sum(executorRunTime) {total_rt:.1f}s, /{cores} cores = "
          f"{total_rt / cores:.2f}s ideal")
    print(
        "stage tasks runT(s) wall(s) tMed tMax inMB shRdMB shWrMB "
        "memSpill diskSpill name"
    )
    for r in sorted(rows):
        print(" ".join(str(x) for x in r))
    return 0


if __name__ == "__main__":
    sys.exit(main())
