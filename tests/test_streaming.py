"""Batch/stream parity: the same windowed transforms run through readStream
(availableNow -> memory sink) must equal their batch run on the same data."""

from __future__ import annotations

import tempfile

import pytest

from nosql_based_business_intelligence_system_spark.sources.tables import load_table
from nosql_based_business_intelligence_system_spark.streaming import windows as W


@pytest.fixture(scope="module")
def events_dir(spark, sf_smoke):  # noqa: F811
    with tempfile.TemporaryDirectory() as d:
        yield W.materialize_events_dir(spark, sf_smoke, f"{d}/events", n_files=4)


def _sorted_rows(df, keys):
    return sorted([tuple(r) for r in df.collect()], key=lambda t: tuple(str(x) for x in t))


def test_tumbling_stream_equals_batch(spark, sf_smoke, events_dir):
    stream = W.read_events_stream(spark, events_dir, max_files_per_trigger=2)
    out = W.tumbling_counts(stream, "1 hour")
    W.run_to_memory_sink(out, "tumbling_test", output_mode="complete")
    got = spark.table("tumbling_test")
    expected = W.tumbling_counts(load_table(spark, sf_smoke, "events"), "1 hour")
    assert _sorted_rows(got, None) == _sorted_rows(expected, None)
    assert got.count() > 0


def test_session_stream_equals_batch(spark, sf_smoke, events_dir):
    stream = W.read_events_stream(spark, events_dir)
    out = W.session_activity(stream, gap="15 minutes")
    W.run_to_memory_sink(out, "session_test", output_mode="complete")
    got = spark.table("session_test")
    expected = W.session_activity(load_table(spark, sf_smoke, "events"), gap="15 minutes")
    assert _sorted_rows(got, None) == _sorted_rows(expected, None)


def test_streaming_dedup_bounded(spark, events_dir):
    stream = W.read_events_stream(spark, events_dir)
    deduped = W.streaming_dedup(stream, watermark="1 hour")
    W.run_to_memory_sink(deduped, "dedup_test", output_mode="append")
    got = spark.table("dedup_test")
    # every surviving event_id unique
    assert got.count() == got.select("event_id").distinct().count()


def test_sliding_stream_runs(spark, events_dir):
    stream = W.read_events_stream(spark, events_dir)
    out = W.sliding_activity(stream)
    W.run_to_memory_sink(out, "sliding_test", output_mode="complete")
    assert spark.table("sliding_test").count() > 0


def test_stateful_user_activity_equals_batch(spark, sf_smoke, events_dir):
    """applyInPandasWithState across micro-batches: the final snapshot per
    user must equal the batch aggregate over the same data."""
    from pyspark.sql import functions as F

    from nosql_based_business_intelligence_system_spark.streaming import stateful as S

    stream = W.read_events_stream(spark, events_dir, max_files_per_trigger=1)
    out = S.user_activity_stateful(stream)
    W.run_to_memory_sink(out, "stateful_test", output_mode="update")
    # update mode emits one snapshot per user per micro-batch: keep the last
    got = (
        spark.table("stateful_test")
        .withColumn(
            "rn",
            F.row_number().over(
                __import__("pyspark").sql.Window.partitionBy("user_id").orderBy(
                    F.desc("n_events")
                )
            ),
        )
        .filter("rn = 1")
        .drop("rn")
    )
    expected = S.user_activity_batch(load_table(spark, sf_smoke, "events"))
    # fold order differs between pandas partial sums and one-shot agg
    norm = lambda df: df.withColumn("total_value", F.round("total_value", 6))
    assert _sorted_rows(norm(got), None) == _sorted_rows(norm(expected), None)


def test_file_sink_checkpoint_no_duplicates(spark, sf_smoke, events_dir, tmp_path):
    """File sink + checkpoint: availableNow drains once; a rerun against the
    same checkpoint must be a no-op (exactly-once bookkeeping)."""
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        q = (
            W.read_events_stream(spark, events_dir, max_files_per_trigger=2)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    n_input = load_table(spark, sf_smoke, "events").count()
    assert spark.read.parquet(out).count() == n_input
    run_once()  # same checkpoint, no new files -> nothing re-emitted
    assert spark.read.parquet(out).count() == n_input


def test_foreach_batch_upsert(spark, events_dir):
    """foreachBatch: micro-batches merged into a driver-side store keyed by
    event_id — the upsert-sink pattern (idempotent per key)."""
    store: dict[int, float] = {}

    def upsert(batch_df, batch_id):
        for r in batch_df.select("event_id", "value").collect():
            store[r.event_id] = r.value

    q = (
        W.read_events_stream(spark, events_dir, max_files_per_trigger=1)
        .writeStream.foreachBatch(upsert)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    src = spark.read.parquet(events_dir)
    assert len(store) == src.select("event_id").distinct().count()


def test_stream_stream_interval_join_equals_batch(spark, sf_smoke, events_dir):
    """Stream-stream interval join (watermarked both sides) must produce
    the same pairs as the identical theta join on batch frames."""
    stream = W.read_events_stream(spark, events_dir, max_files_per_trigger=2)
    out = W.purchases_with_recent_click(
        stream.filter("event_type = 'purchase'"),
        stream.filter("event_type = 'click'"),
        horizon="2 hours",
    )
    W.run_to_memory_sink(out, "ssjoin_test", output_mode="append")
    got = spark.table("ssjoin_test")
    batch = load_table(spark, sf_smoke, "events")
    expected = W.purchases_with_recent_click(
        batch.filter("event_type = 'purchase'"),
        batch.filter("event_type = 'click'"),
        horizon="2 hours",
    )
    assert got.count() == expected.count() > 0
    assert _sorted_rows(got, None) == _sorted_rows(expected, None)


# --- streaming corpus curation (stateless LLM-pipeline ops) ------------------


@pytest.fixture(scope="module")
def docs_dir(spark, sf_smoke):  # noqa: F811
    from nosql_based_business_intelligence_system_spark.streaming import corpus as C

    with tempfile.TemporaryDirectory() as d:
        yield C.materialize_docs_dir(spark, sf_smoke, f"{d}/docs", n_files=4)


def test_quality_filter_stream_equals_batch(spark, sf_smoke, docs_dir):
    """quality_flags is a stateless projection: identical results via
    readStream (append mode, no watermark) and batch."""
    from nosql_based_business_intelligence_system_spark.queries.text_suite import (
        quality_flags,
    )
    from nosql_based_business_intelligence_system_spark.streaming import corpus as C

    stream = C.read_docs_stream(spark, docs_dir, max_files_per_trigger=2)
    W.run_to_memory_sink(quality_flags(stream), "qf_stream", output_mode="append")
    got = spark.table("qf_stream")
    expected = quality_flags(load_table(spark, sf_smoke, "documents"))
    assert _sorted_rows(got, None) == _sorted_rows(expected, None)
    assert got.count() > 0


def test_contamination_flags_stream_equals_batch(spark, sf_smoke, docs_dir):
    """flag_contaminated is stateless (in-row shingles x broadcast eval
    set): the stream-static cross join appends flags with no state."""
    from pyspark.sql import functions as F

    from nosql_based_business_intelligence_system_spark.operators import decontam
    from nosql_based_business_intelligence_system_spark.streaming import corpus as C

    batch_docs = load_table(spark, sf_smoke, "documents")
    ev = batch_docs.filter(F.col("source").isin("src0", "src1"))
    eval_sh = decontam.eval_shingle_set(ev, n=5)

    stream = C.read_docs_stream(spark, docs_dir)
    flagged = decontam.flag_contaminated(
        stream.filter(~F.col("source").isin("src0", "src1")), eval_sh, n=5
    ).select("doc_id", "n_shared_ngrams", "is_contaminated")
    W.run_to_memory_sink(flagged, "contam_stream", output_mode="append")
    got = spark.table("contam_stream")

    expected = decontam.flag_contaminated(
        batch_docs.filter(~F.col("source").isin("src0", "src1")), eval_sh, n=5
    ).select("doc_id", "n_shared_ngrams", "is_contaminated")
    assert _sorted_rows(got, None) == _sorted_rows(expected, None)


def test_chunking_is_stream_safe(spark, sf_smoke):
    """The RAG chunker is a stateless narrow transform, so the SAME
    function must run on a readStream unchanged and produce exactly the
    batch result (availableNow -> memory sink, append mode — no state,
    no watermark needed)."""
    import tempfile

    from nosql_based_business_intelligence_system_spark.operators.chunk import (
        chunk_documents,
    )

    docs = load_table(spark, sf_smoke, "documents")
    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/docs"
        docs.repartition(3).write.parquet(path)
        stream = spark.readStream.schema(docs.schema).option(
            "maxFilesPerTrigger", 1
        ).parquet(path)
        out = chunk_documents(stream, chunk_tokens=64, overlap_tokens=16)
        q = (
            out.writeStream.format("memory")
            .queryName("chunk_stream_test")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = spark.table("chunk_stream_test")
        expected = chunk_documents(docs, chunk_tokens=64, overlap_tokens=16)
        assert _sorted_rows(got, None) == _sorted_rows(expected, None)
        assert got.count() > 0


def test_stateful_heavy_hitters_exact_regime_equals_batch(spark, sf_smoke, events_dir):
    """Streaming Misra-Gries with k above the per-bucket distinct count is
    EXACT: the final per-bucket summaries must equal exact per-bucket
    counts (event_type has a handful of distinct values)."""
    from pyspark.sql import Window as Win
    from pyspark.sql import functions as F

    from nosql_based_business_intelligence_system_spark.streaming import stateful as S

    stream = W.read_events_stream(spark, events_dir, max_files_per_trigger=1)
    out = S.heavy_hitters_stateful(
        stream.select("event_type"), "event_type", k=16, n_buckets=4
    )
    W.run_to_memory_sink(out, "hh_state_test", output_mode="update")
    got = (
        spark.table("hh_state_test")
        .withColumn(
            "rn",
            F.row_number().over(
                Win.partitionBy("bucket", "item").orderBy(F.desc("bucket_n"))
            ),
        )
        .filter("rn = 1")
        .select("bucket", "item", "est_count")
    )
    expected = S.heavy_hitters_batch_exact(
        load_table(spark, sf_smoke, "events").select("event_type"),
        "event_type",
        n_buckets=4,
    )
    assert _sorted_rows(got, None) == _sorted_rows(expected, None)
    assert got.count() > 0
