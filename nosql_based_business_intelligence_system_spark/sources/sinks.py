"""Sinks: the reference's export surface, Spark-native (SURVEY.md §2.1).

- S2 CSV dump -> ``df.write.csv``
- S3/S4 JSONL document collections -> ``df.write.json`` (Spark's JSON writer
  emits JSONL with real NULLs and ISO timestamps — the reference's 21-line
  per-row type-normalization loop, Project.py:341-361, disappears)
- partitioned Parquet fact layout (fin_year/fin_month_num) — the 100 TB
  storage answer: dynamic partition pruning on fiscal-month predicates
- S5 Excel summary reduced to its engine-side inputs: the small aggregate
  DataFrames collected to the driver (xlsxwriter isn't in this container;
  the presentation write is stubbed behind an import-try, the data
  preparation is real)
- S7 MongoDB handoff: the JSONL collections ARE the mongoimport payload;
  a connector write is gated behind an import-try (no connector jar here).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Collection projections (Project.py:367-395), existence-filtered like the
#: reference's `if c in df.columns` guards.
SALES_LINES_COLS = (
    "doc_number", "customer_number", "product_code", "product_desc",
    "brand_desc", "region_code", "region_desc", "quantity",
    "total_line_price", "last_cost", "asp", "cogs", "gross_margin", "gm_pct",
    "transtype_code", "transtype_desc", "inventory_code", "rep_code",
    "event_date", "fin_week_label", "fin_month_label", "fin_month_start",
    "fin_month_end", "fin_quarter",
)
RECEIVABLES_COLS = (
    "customer_number", "cust_desc", "total_due", "amt_current", "amt_30_days",
    "amt_60_days", "amt_90_days", "amt_120_days", "amt_150_days",
    "amt_180_days", "amt_210_days", "amt_240_days", "fin_month_label",
    "fin_month_start", "fin_month_end", "region_desc",
)
PAYMENTS_COLS = (
    "doc_number", "customer_number", "tot_payment", "bank_amt",
    "deposit_date", "event_date", "fin_week_label", "fin_month_label",
    "fin_quarter", "region_desc",
)

COLLECTIONS: dict[str, tuple[str, ...]] = {
    "sales_lines": SALES_LINES_COLS,
    "receivables": RECEIVABLES_COLS,
    "payments": PAYMENTS_COLS,
}


def project_existing(df: DataFrame, cols: tuple[str, ...]) -> DataFrame:
    """S4: keep declared columns that exist (schema-variation tolerance)."""
    existing = [c for c in cols if c in df.columns]
    return df.select(*existing)


def write_jsonl(df: DataFrame, path: str, coalesce: int | None = None) -> None:
    """S3: JSONL sink. ``coalesce`` for small exports that should be one
    file; leave None at scale so writers parallelize."""
    out = df.coalesce(coalesce) if coalesce else df
    out.write.mode("overwrite").json(path)


def export_collections(
    df: DataFrame, out_dir: str, collections: dict[str, tuple[str, ...]] | None = None
) -> dict[str, str]:
    """S4+S3: write each document collection as JSONL under out_dir/<name>.

    The output is directly ``mongoimport``-able (the reference's S7 handoff,
    Project.py:420-423) — one JSON object per line.
    """
    paths: dict[str, str] = {}
    for name, cols in (collections or COLLECTIONS).items():
        p = os.path.join(out_dir, name)
        write_jsonl(project_existing(df, cols), p)
        paths[name] = p
    return paths


def write_csv(df: DataFrame, path: str) -> None:
    """S2: full-table CSV dump (header, no index column — Spark has none)."""
    df.write.mode("overwrite").option("header", True).csv(path)


def write_partitioned_fact(
    df: DataFrame,
    path: str,
    partition_cols: tuple[str, ...] = ("fin_year", "fin_month_num"),
) -> None:
    """Fiscal-partitioned Parquet layout for fact tables.

    At 100 TB this is what makes month-ranged queries prune: static and
    dynamic partition pruning both key off the directory layout. Writers
    shuffle on the partition columns first so each partition is written by
    few tasks (avoids the many-small-files failure mode).
    """
    (
        df.repartition(*[F.col(c) for c in partition_cols])
        .write.mode("overwrite")
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 32,
    sort: bool = True,
) -> None:
    """Bucketed (hash-clustered) managed-table layout.

    Two tables bucketed by the same key with the same bucket count join
    WITHOUT a shuffle (and without even a sort, when ``sortBy`` matches) —
    the answer for repeated fact-fact joins (lineitem ⋈ orders on orderkey)
    where re-shuffling 100 TB per query is the dominant cost. Bucketing
    requires ``saveAsTable`` (the bucket spec lives in the catalog).
    """
    w = df.write.format("parquet").bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    w.mode("overwrite").saveAsTable(table)


def summary_sheet_inputs(enriched: DataFrame) -> dict[str, DataFrame]:
    """S5 reduced to engine work: the small DataFrames the Excel report
    collects (summary scalars, aggregates, quality sample). Presentation
    (xlsxwriter) is out of engine scope and absent from this container."""
    from ..functions.cleaning import sum0

    flags = (
        F.col("flag_negative_qty")
        | F.col("flag_negative_price")
        | F.col("flag_zero_price_nonzero_qty")
    )
    return {
        "summary": enriched.agg(
            F.count(F.lit(1)).alias("row_count"),
            F.min("event_date").alias("min_date"),
            F.max("event_date").alias("max_date"),
            sum0(F.col("total_line_price")).alias("total_revenue"),
            F.countDistinct("fin_month_label").alias("n_fiscal_months"),
        ),
        "sales_by_month": enriched.groupBy("fin_month_label").agg(
            sum0(F.col("total_line_price")).alias("revenue")
        ),
        "quality_sample": enriched.filter(flags).limit(1000),
    }


def write_excel_report(
    sheets: dict[str, DataFrame],
    path: str,
    charts: dict[str, tuple[DataFrame, str, str]] | None = None,
) -> bool:
    """S5+S6 presentation step. Returns False (skipped) when no Excel
    writer library is available — the data side lives in
    summary_sheet_inputs, and the chart PNGs themselves come from the
    stdlib renderer (sources/charts.py), so only the workbook *embedding*
    is xlsxwriter-gated (reference embeds matplotlib PNGs,
    Project.py:312-324).

    ``charts`` maps sheet name -> (aggregated df, label_col, value_col) or
    (df, label_col, value_col, kind) with kind "bar" (default) or "line"
    — the reference report is one line chart (revenue trend,
    Project.py:231-245) plus one bar chart (top products, :248-267).
    """
    try:
        import pandas as pd  # noqa: F401
        import xlsxwriter  # noqa: F401
    except ImportError:
        return False
    import io

    import pandas as pd

    from .charts import chart_png, line_chart_png

    renderers = {"bar": chart_png, "line": line_chart_png}
    with pd.ExcelWriter(path, engine="xlsxwriter") as xw:
        for name, df in sheets.items():
            df.limit(10000).toPandas().to_excel(xw, sheet_name=name[:31], index=False)
        for name, spec in (charts or {}).items():
            df, label_col, value_col = spec[:3]
            kind = spec[3] if len(spec) > 3 else "bar"
            png = renderers[kind](df, label_col, value_col)
            ws = xw.book.add_worksheet(name[:31])
            ws.insert_image(
                "B2", f"{name}.png", {"image_data": io.BytesIO(png)}
            )
    return True
