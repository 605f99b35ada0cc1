"""CSV/JSON ingest layer — the reference's ETL spine re-expressed as one
declarative projection (SURVEY.md §2: S1, P1-P3, SF1-SF3, NF1, DF1-DF2).

The reference (Project.py:14-64) does this in ~10 eager pandas passes; here
the clean/coerce/derive pipeline is a single ``select`` so the whole thing
whole-stage-codegens into one pass over the scan.
"""

from __future__ import annotations

import re
from collections.abc import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

from ..functions import cleaning

#: Measure columns coerce-cast to double on ingest (Project.py:41-49).
MEASURE_COLUMNS = (
    "total_due",
    "amt_current",
    "amt_30_days",
    "amt_60_days",
    "amt_90_days",
    "amt_120_days",
    "amt_150_days",
    "amt_180_days",
    "amt_210_days",
    "amt_240_days",
    "quantity",
    "total_line_price",
    "last_cost",
    "tot_payment",
    "bank_amt",
    "transtype_code",
)

#: Date columns coerce-parsed to timestamp (Project.py:53-55).
DATE_COLUMNS = ("trans_date", "deposit_date")

#: Index-artifact columns dropped on sight (Project.py:32-34).
INDEX_COLUMNS = ("unnamed_0", "index", "unnamed")


def to_snake(name: str) -> str:
    """Column-name normalization (Project.py:20-25): non-word runs -> _,
    collapse, strip, lowercase."""
    s = re.sub(r"[^\w]+", "_", name)
    s = re.sub(r"\s+", "_", s)
    s = re.sub(r"_+", "_", s)
    return s.strip("_").lower()


def find_column(patterns: Iterable[str], columns: Iterable[str]) -> str | None:
    """Fuzzy column resolution (Project.py:158-164): first column whose
    lowercase name contains any pattern, in pattern order."""
    cols = list(columns)
    for pat in patterns:
        p = pat.lower()
        for c in cols:
            if p in c.lower():
                return c
    return None


def normalize_names(df: DataFrame) -> DataFrame:
    """P1: snake_case every column (driver-side metadata op, no job)."""
    return df.toDF(*[to_snake(c) for c in df.columns])


def clean_frame(
    df: DataFrame,
    measure_cols: Iterable[str] = MEASURE_COLUMNS,
    date_cols: Iterable[str] = DATE_COLUMNS,
) -> DataFrame:
    """One-projection clean: drop index artifacts, trim + sentinel-NULL all
    strings, coerce measures to double, coerce dates to timestamp, derive
    event_date (row-level coalesce generalization of DF2)."""
    df = df.drop(*INDEX_COLUMNS)  # Spark drop ignores missing names
    measures = set(measure_cols)
    dates = set(date_cols)
    exprs = []
    for f in df.schema.fields:
        c = F.col(f.name)
        if f.name in measures:
            exprs.append(cleaning.coerce_double(c).alias(f.name))
        elif f.name in dates:
            exprs.append(cleaning.coerce_timestamp(c).alias(f.name))
        elif isinstance(f.dataType, StringType):
            exprs.append(cleaning.clean_string(c).alias(f.name))
        else:
            exprs.append(c)
    out = df.select(*exprs)
    cols = set(out.columns)
    if "trans_date" in cols and "deposit_date" in cols:
        ev = cleaning.event_date(F.col("trans_date"), F.col("deposit_date"))
    elif "trans_date" in cols:
        ev = F.col("trans_date")
    elif "deposit_date" in cols:
        ev = F.col("deposit_date")
    else:
        ev = F.lit(None).cast("timestamp")
    return out.withColumn("event_date", F.to_date(ev))


def ingest_csv(
    spark: SparkSession,
    path: str,
    infer_schema: bool = True,
    measure_cols: Iterable[str] = MEASURE_COLUMNS,
    date_cols: Iterable[str] = DATE_COLUMNS,
) -> DataFrame:
    """S1 + the full clean pipeline: headered CSV -> normalized, typed frame.

    ``inferSchema`` mirrors the reference's whole-file inference
    (low_memory=False); production would pass an explicit StructType and
    skip the extra inference pass.
    """
    df = (
        spark.read.option("header", True)
        .option("inferSchema", infer_schema)
        .csv(path)
    )
    return clean_frame(normalize_names(df), measure_cols, date_cols)


def observe_quality(df: DataFrame, name: str = "ingest"):
    """Attach zero-cost pipeline metrics to a frame: row count plus a
    null-count per measure column present. Returns (df, Observation);
    after any action on ``df``, ``observation.get`` holds the metrics —
    the production pattern for emitting ingest counters without a second
    pass over the data.
    """
    from pyspark.sql import Observation

    obs = Observation(name)
    metrics = [F.count(F.lit(1)).alias("n_rows")]
    for c in MEASURE_COLUMNS:
        if c in df.columns:
            metrics.append(
                F.sum(F.col(c).isNull().cast("int")).alias(f"n_null_{c}")
            )
    return df.observe(obs, *metrics), obs


def ingest_csv_quarantine(
    spark: SparkSession,
    path: str,
    schema,
    measure_cols: Iterable[str] = MEASURE_COLUMNS,
    date_cols: Iterable[str] = DATE_COLUMNS,
) -> tuple[DataFrame, DataFrame]:
    """Explicit-schema CSV ingest that QUARANTINES malformed rows instead
    of failing the job (ANSI/FAILFAST) or silently nulling them
    (plain PERMISSIVE): returns (clean frame, quarantine frame of raw
    malformed lines). At 100 TB one bad exported line must never kill an
    ingest, and dropping it unrecorded is a silent data loss — the
    quarantine frame is what ops replays after fixing the producer.

    The reader keeps the raw line of any row that fails the schema in
    ``_corrupt_record``; the split is one filter each way. The persist is
    required, not an optimization: Spark disallows referencing only the
    internal corrupt-record column of an unpersisted CSV scan
    (SPARK-26108), and it also guarantees both halves see the same parse.
    The cached scan stays registered for the session (both returned
    frames reference it, so this function cannot unpersist it); a
    long-lived driver that ingests many files should
    ``spark.catalog.clearCache()`` between batches.
    """
    from pyspark.sql.types import StringType, StructField, StructType

    full = StructType(
        list(schema.fields) + [StructField("_corrupt_record", StringType())]
    )
    raw = (
        spark.read.option("header", True)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .schema(full)
        .csv(path)
        .persist()
    )
    good = raw.filter(F.col("_corrupt_record").isNull()).drop(
        "_corrupt_record"
    )
    quarantine = raw.filter(F.col("_corrupt_record").isNotNull()).select(
        F.col("_corrupt_record").alias("raw_line")
    )
    return (
        clean_frame(normalize_names(good), measure_cols, date_cols),
        quarantine,
    )


def ingest_jsonl(
    spark: SparkSession,
    path: str,
    measure_cols: Iterable[str] = MEASURE_COLUMNS,
    date_cols: Iterable[str] = DATE_COLUMNS,
) -> DataFrame:
    """Read a JSONL collection back through the same clean pipeline — the
    round-trip side of the S3/S7 handoff (our sinks' JSONL output and any
    ``mongoexport``-style dump are line-delimited JSON; Spark's JSON source
    reads them natively, schema inferred in one pass).
    """
    return clean_frame(normalize_names(spark.read.json(path)), measure_cols, date_cols)
