"""Streaming document-corpus shapes: the LLM-pipeline operators that are
STATELESS projections (quality filtering, PII redaction, contamination
flagging against a static benchmark set) run on a document stream with
the exact same plan as their batch form — this module provides the
stream source plumbing; parity is proven in tests/test_streaming.py.

The stream-vs-batch split mirrors a real curation pipeline: bulk backfill
runs the batch operators; the live crawl-ingest path runs these same
column expressions in append mode with no watermark (no state to bound).
Aggregating shapes (dedup, shard packing) stay batch / micro-batch — they
need cross-doc state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as Ty

DOCS_SCHEMA = Ty.StructType(
    [
        Ty.StructField("doc_id", Ty.LongType()),
        Ty.StructField("text", Ty.StringType()),
        Ty.StructField("lang", Ty.StringType()),
        Ty.StructField("source", Ty.StringType()),
        Ty.StructField("n_chars", Ty.LongType()),
    ]
)


def materialize_docs_dir(
    spark: SparkSession, sf_dir: str, out_dir: str, n_files: int = 4
) -> str:
    """Rewrite the fixture documents as several parquet files so a file
    stream sees multiple micro-batches."""
    from ..sources.tables import load_table

    load_table(spark, sf_dir, "documents").repartition(n_files).write.mode(
        "overwrite"
    ).parquet(out_dir)
    return out_dir


def read_docs_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    reader = spark.readStream.schema(DOCS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)
