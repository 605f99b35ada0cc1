"""ParquetUpsertSink regressions: streamed keyed upsert must equal the
batch last-write-wins state, retried epochs must not double-apply, and
readers must always see a committed snapshot."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from nosql_based_business_intelligence_system_spark.sources.tables import load_table
from nosql_based_business_intelligence_system_spark.streaming import windows as W
from nosql_based_business_intelligence_system_spark.streaming.sinks import (
    ContinuousAggregateSink,
    ParquetUpsertSink,
    run_upsert,
    upsert_batch,
)


@pytest.fixture(scope="module")
def events_dir(spark, sf_smoke):
    with tempfile.TemporaryDirectory() as d:
        yield W.materialize_events_dir(spark, sf_smoke, f"{d}/events", n_files=4)


def test_upsert_batch_last_write_wins(spark):
    cur = spark.createDataFrame([Row(k=1, v="old", o=1), Row(k=2, v="keep", o=1)])
    batch = spark.createDataFrame(
        [Row(k=1, v="mid", o=2), Row(k=1, v="new", o=3), Row(k=3, v="ins", o=1)]
    )
    got = {r.k: (r.v, r.o) for r in upsert_batch(cur, batch, ["k"], "o").collect()}
    assert got == {1: ("new", 3), 2: ("keep", 1), 3: ("ins", 1)}
    # None current -> just the deduped batch
    first = {r.k: r.v for r in upsert_batch(None, batch, ["k"], "o").collect()}
    assert first == {1: "new", 3: "ins"}


def test_streamed_upsert_equals_batch_state(spark, sf_smoke, events_dir):
    stream = W.read_events_stream(spark, events_dir, max_files_per_trigger=1)
    with tempfile.TemporaryDirectory() as d:
        sink = ParquetUpsertSink(f"{d}/state", keys=["user_id"], order_col="ts")
        run_upsert(stream, sink, f"{d}/ckpt")
        assert sink.committed_epoch() is not None and sink.committed_epoch() > 0
        got = sink.read(spark).select("user_id", "ts", "event_id")
        ev = load_table(spark, sf_smoke, "events")
        expected = (
            ev.groupBy("user_id")
            .agg(F.max_by(F.struct("ts", "event_id"), F.struct("ts", "event_id")).alias("r"))
            .select("user_id", "r.ts", "r.event_id")
        )
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, expected.collect())
        )


def test_retried_epoch_is_noop(spark):
    rows = spark.createDataFrame([Row(k=1, n=1)])
    with tempfile.TemporaryDirectory() as d:
        sink = ParquetUpsertSink(f"{d}/state", keys=["k"], order_col="n")
        sink(rows, 0)
        sink(spark.createDataFrame([Row(k=1, n=2)]), 1)
        before = sink.read(spark).collect()
        # stale retries of both epochs: must change nothing
        sink(rows, 0)
        sink(spark.createDataFrame([Row(k=1, n=99)]), 1)
        assert sink.read(spark).collect() == before
        assert sink.committed_epoch() == 1


def _cagg_sink(d):
    return ContinuousAggregateSink(
        f"{d}/agg",
        ts="ts",
        group_by=["event_type"],
        measures=[
            ("n", F.lit(1), "count"),
            ("sv", F.col("value").cast("decimal(38,6)"), "sum"),
            ("mx", F.col("value"), "max"),
        ],
        resolution="hour",
    )


def test_continuous_agg_stream_equals_batch_rollup(spark, sf_smoke, events_dir):
    stream = W.read_events_stream(spark, events_dir, max_files_per_trigger=1)
    with tempfile.TemporaryDirectory() as d:
        sink = _cagg_sink(d)
        run_upsert(stream, sink, f"{d}/ckpt")
        assert sink.committed_epoch() is not None and sink.committed_epoch() > 0
        got = sink.read(spark)
        ev = load_table(spark, sf_smoke, "events")
        expected = ev.groupBy(
            F.date_trunc("hour", "ts").alias("bucket_start"), "event_type"
        ).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(38,6)")).alias("sv"),
            F.max("value").alias("mx"),
        )
        key = lambda r: (r.bucket_start, r.event_type)  # noqa: E731
        assert {key(r): (r.n, r.sv, r.mx) for r in got.collect()} == {
            key(r): (r.n, r.sv, r.mx) for r in expected.collect()
        }


def test_continuous_agg_late_rows_fold_into_old_bucket(spark):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 10, 15)
    late = dt.datetime(2024, 1, 1, 10, 45)  # same hour bucket, arrives later
    mk = lambda ts, et, v: Row(ts=ts, event_type=et, value=v)  # noqa: E731
    with tempfile.TemporaryDirectory() as d:
        sink = _cagg_sink(d)
        sink(spark.createDataFrame([mk(t0, "a", 1.0), mk(t0, "b", 5.0)]), 0)
        sink(spark.createDataFrame([mk(late, "a", 3.0)]), 1)
        got = {
            (r.bucket_start, r.event_type): (r.n, float(r.sv), r.mx)
            for r in sink.read(spark).collect()
        }
        bucket = dt.datetime(2024, 1, 1, 10)
        assert got == {
            (bucket, "a"): (2, 4.0, 3.0),
            (bucket, "b"): (1, 5.0, 5.0),
        }
        # replayed epoch must not double-add
        sink(spark.createDataFrame([mk(late, "a", 3.0)]), 1)
        assert {
            (r.bucket_start, r.event_type): (r.n, float(r.sv), r.mx)
            for r in sink.read(spark).collect()
        } == got


def test_snapshot_pruning_keeps_reader_window(spark):
    import os

    rows = lambda n: spark.createDataFrame([Row(k=1, n=n)])  # noqa: E731
    with tempfile.TemporaryDirectory() as d:
        sink = ParquetUpsertSink(
            f"{d}/state", keys=["k"], order_col="n", keep_versions=2
        )
        for e in range(5):
            sink(rows(e), e)
        vs = sorted(x for x in os.listdir(f"{d}/state") if x.startswith("v="))
        assert vs == ["v=3", "v=4"]
        assert sink.read(spark).collect()[0].n == 4
