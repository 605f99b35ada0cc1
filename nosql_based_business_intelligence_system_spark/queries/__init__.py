"""Driver-contract query registry (backs ``__spark_entry__``)."""

from .registry import QUERIES, oracle_sql, queries  # noqa: F401
