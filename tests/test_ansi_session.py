"""Driver-session resilience: the harness builds its OWN SparkSession,
possibly with ANSI mode on. Every entrypoint wraps queries with
tune_for_session, which must flip the runtime-settable parity confs back —
otherwise coercing casts start throwing and NULL-compare semantics drift."""

from __future__ import annotations

import importlib.util
import sys


def _entry_module():
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", "/root/repo/__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules.setdefault("__spark_entry__", mod)
    spec.loader.exec_module(mod)
    return mod


def test_queries_self_tune_on_ansi_session(spark, sf_smoke):
    mod = _entry_module()
    qs = mod.queries()
    baseline = {tuple(r) for r in qs["line_metrics"](spark, sf_smoke).collect()}
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        # cast-heavy query through the driver surface on an ANSI session:
        # must neither throw nor change results
        got = {tuple(r) for r in qs["line_metrics"](spark, sf_smoke).collect()}
        assert got == baseline
        # the wrapper reset the conf for parity
        assert spark.conf.get("spark.sql.ansi.enabled") == "false"
        # overflow-sensitive path: MinHash's wrapping multiply would raise
        # under ANSI arithmetic — the wrapper must protect it too
        spark.conf.set("spark.sql.ansi.enabled", "true")
        qs["dedup_minhash"](spark, sf_smoke).count()
        assert spark.conf.get("spark.sql.ansi.enabled") == "false"
    finally:
        spark.conf.set("spark.sql.ansi.enabled", "false")


def test_entry_runs_on_ansi_session(spark):
    mod = _entry_module()
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        assert mod.entry(spark).count() > 0
    finally:
        spark.conf.set("spark.sql.ansi.enabled", "false")
