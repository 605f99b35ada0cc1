"""Z-order layout regressions: the clustered parquet must (a) hold exactly
the same rows and (b) measurably tighten row-group min/max stats on EVERY
participating dimension — quantified as the fraction of row groups a
point predicate can skip, compared against the default (unsorted) layout."""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from nosql_based_business_intelligence_system_spark.sources.layout import write_zordered, zorder_key
from nosql_based_business_intelligence_system_spark.sources.tables import load_table


def _candidate_fraction(path: str, col: str, value) -> float:
    """Fraction of row groups whose [min,max] admit ``col == value``."""
    total = candidates = 0
    ds = pq.ParquetDataset(path)
    for frag in ds.fragments:
        md = frag.metadata
        schema_names = [md.row_group(0).column(c).path_in_schema
                        for c in range(md.num_columns)] if md.num_row_groups else []
        ci = schema_names.index(col)
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(ci).statistics
            total += 1
            if st is None or st.min is None:
                candidates += 1
            elif st.min <= value <= st.max:
                candidates += 1
    assert total > 0
    return candidates / total


@pytest.fixture(scope="module")
def layouts(spark, sf_correctness, tmp_path_factory):
    # sf0.01 (15k orders): enough row groups for skip fractions to resolve
    d = tmp_path_factory.mktemp("zorder")
    orders = load_table(spark, sf_correctness, "orders")
    plain, zpath = str(d / "plain"), str(d / "z")
    # same file count for a fair row-group comparison
    orders.repartition(16).write.mode("overwrite").parquet(plain)
    write_zordered(orders, zpath, ["o_custkey", "o_totalprice"], n_files=16)
    return orders, plain, zpath


def test_zorder_preserves_rows(spark, layouts):
    orders, _, zpath = layouts
    got = spark.read.parquet(zpath)
    assert got.count() == orders.count()
    a = sorted(map(tuple, got.select("o_orderkey", "o_totalprice").collect()))
    b = sorted(map(tuple, orders.select("o_orderkey", "o_totalprice").collect()))
    assert a == b


def test_zorder_skips_on_both_dimensions(spark, layouts):
    orders, plain, zpath = layouts
    # 0.3 quantile: off the top-level curve boundary (a median point sits
    # exactly where the first Morton bit splits, the worst case for
    # min/max pruning)
    mid = orders.approxQuantile(["o_custkey", "o_totalprice"], [0.3], 0.01)
    custkey, price = int(mid[0][0]), float(mid[1][0])
    for col, val in (("o_custkey", custkey), ("o_totalprice", price)):
        base = _candidate_fraction(plain, col, val)
        z = _candidate_fraction(zpath, col, val)
        # unsorted: every row group admits the value; z-order: most skip.
        # The z bound is 10/16, not 8/16: repartitionByRange draws its
        # range-boundary sample with a seed derived from the RDD id, so
        # the exact file cut points shift with SESSION HISTORY (the r13
        # full-suite run read 9/16 where the isolated run read 8/16 —
        # same code, same data). The property under test — multi-dim
        # skipping beats the unsorted layout by a wide margin — is
        # unchanged at either cut.
        assert base > 0.9, (col, base)
        assert z <= 0.625, (col, z)


def test_zorder_key_validation(spark, sf_smoke):
    orders = load_table(spark, sf_smoke, "orders")
    with pytest.raises(ValueError, match="non-empty"):
        zorder_key(orders, [])
    with pytest.raises(ValueError, match="overflows"):
        zorder_key(orders, ["o_custkey", "o_totalprice"], bits=32)
