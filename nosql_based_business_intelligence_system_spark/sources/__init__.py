"""Scans (CSV/Parquet ingest) and sinks (CSV/JSONL collection export)."""

from .tables import TABLES, load_table, load_tables  # noqa: F401
