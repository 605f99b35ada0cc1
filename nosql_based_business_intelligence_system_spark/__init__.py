"""nosql_based_business_intelligence_system_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference BI system
(`itumeleng-ramoshaba14/NoSQL-Based-Business-Intelligence-System`,
``/root/reference/Project.py``), extended with large-scale training-data
pipeline operators (dedup, similarity search, text analysis, streaming).

Layout
------
- ``session``    — SparkSession factory with scale-oriented defaults (AQE, etc.)
- ``sources``    — scans/ingest (CSV/Parquet/JSON) and sinks (JSONL collections)
- ``functions``  — column-expression libraries (fiscal calendar, cleaning
                   parity, derived metrics, text, vectors)
- ``operators``  — composed DataFrame -> DataFrame operators (aggregates,
                   star joins, top-k, dedup, similarity)
- ``streaming``  — Structured Streaming facet reusing the batch expressions
- ``queries``    — the registry that backs ``__spark_entry__`` (driver contract)
- ``plans``      — plan inspection helpers (explain capture, shuffle counting)

Everything is expressed through the DataFrame API so Catalyst owns planning:
predicate pushdown, column pruning, partial aggregation, broadcast joins and
AQE all apply without engine-side scheduling.
"""

__version__ = "0.1.0"
