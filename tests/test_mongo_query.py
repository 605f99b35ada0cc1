"""Mongo aggregation-pipeline translator: semantics + plan quality."""

from __future__ import annotations

import pytest

from pyspark.sql import Row

from nosql_based_business_intelligence_system_spark.operators.mongo_query import (
    MongoTranslateError,
    mongo_pipeline,
)

DOCS = [
    Row(region="N", brand="a", qty=2.0, price=10.0, tags=["x", "y"]),
    Row(region="N", brand="b", qty=1.0, price=30.0, tags=["x"]),
    Row(region="S", brand="a", qty=5.0, price=20.0, tags=[]),
    Row(region="S", brand="a", qty=None, price=40.0, tags=["z"]),
]


def _df(spark):
    return spark.createDataFrame(DOCS)


def test_match_group_sort(spark):
    out = mongo_pipeline(
        _df(spark),
        [
            {"$match": {"price": {"$gte": 15.0}}},
            {"$group": {"_id": "$region", "revenue": {"$sum": "$price"}, "n": {"$sum": 1}}},
            {"$sort": {"revenue": -1}},
        ],
    ).collect()
    assert [(r._id, r.revenue, r.n) for r in out] == [("S", 60.0, 2), ("N", 30.0, 1)]


def test_compound_group_and_arithmetic(spark):
    out = mongo_pipeline(
        _df(spark),
        [
            {"$addFields": {"total": {"$multiply": ["$qty", "$price"]}}},
            {"$group": {"_id": {"region": "$region", "brand": "$brand"},
                        "t": {"$sum": "$total"}}},
        ],
    ).collect()
    got = {(r.region, r.brand): r.t for r in out}
    assert got[("N", "a")] == 20.0 and got[("S", "a")] == 100.0


def test_match_operators(spark):
    out = mongo_pipeline(
        _df(spark),
        [{"$match": {"$or": [{"region": "N"}, {"qty": {"$gt": 4.0}}],
                     "brand": {"$in": ["a", "b"]}}}],
    )
    assert out.count() == 3


def test_unwind_and_count(spark):
    out = mongo_pipeline(
        _df(spark), [{"$unwind": "$tags"}, {"$count": "n_tags"}]
    ).collect()
    assert out[0].n_tags == 4


def test_project_rename_and_cond(spark):
    rows = mongo_pipeline(
        _df(spark),
        [
            {"$project": {
                "region": 1,
                "big": {"$cond": [{"$gte": ["$price", 25.0]}, 1, 0]},
                "qty_filled": {"$ifNull": ["$qty", 0.0]},
            }},
        ],
    ).collect()
    assert sum(r.big for r in rows) == 2
    assert sorted(r.qty_filled for r in rows) == [0.0, 1.0, 2.0, 5.0]


def test_unsupported_raises(spark):
    with pytest.raises(MongoTranslateError):
        mongo_pipeline(_df(spark), [{"$lookup": {}}])
    with pytest.raises(MongoTranslateError):
        mongo_pipeline(_df(spark), [{"$match": {"price": {"$type": "double"}}}])


def test_sort_limit_plans_topk(spark):
    from nosql_based_business_intelligence_system_spark.plans.inspect import uses_take_ordered

    out = mongo_pipeline(
        _df(spark),
        [{"$sort": {"price": -1}}, {"$limit": 2}],
    )
    assert uses_take_ordered(out)
    assert [r.price for r in out.collect()] == [40.0, 30.0]


def test_find_surface(spark):
    from nosql_based_business_intelligence_system_spark.operators.mongo_query import mongo_find

    rows = mongo_find(
        _df(spark),
        filter={"region": "S"},
        projection={"brand": 1, "price": 1},
        sort={"price": -1},
        limit=1,
    ).collect()
    assert [tuple(r) for r in rows] == [("a", 40.0)]


ORDERS = [
    Row(okey=1, cust="c1", total=10.0),
    Row(okey=2, cust="c1", total=20.0),
    Row(okey=3, cust="c9", total=5.0),   # no matching customer
]
CUSTS = [
    Row(cid="c1", segment="RETAIL"),
    Row(cid="c2", segment="WHOLESALE"),
]


def test_lookup_array_semantics(spark):
    out = mongo_pipeline(
        spark.createDataFrame(ORDERS),
        [{"$lookup": {"from": spark.createDataFrame(CUSTS),
                      "localField": "cust", "foreignField": "cid", "as": "c"}}],
    ).collect()
    by_key = {r.okey: r.c for r in out}
    assert by_key[1][0].segment == "RETAIL"
    assert by_key[3] == []  # empty array, not null (Mongo semantics)


def test_lookup_unwind_fuses_to_plain_join(spark):
    df = mongo_pipeline(
        spark.createDataFrame(ORDERS),
        [
            {"$lookup": {"from": spark.createDataFrame(CUSTS),
                         "localField": "cust", "foreignField": "cid", "as": "c"}},
            {"$unwind": "$c"},
            {"$group": {"_id": {"segment": "$c.segment"},
                        "revenue": {"$sum": "$total"}}},
        ],
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "collect_list" not in plan  # fused: no array round-trip
    rows = {r.segment: r.revenue for r in df.collect()}
    assert rows == {"RETAIL": 30.0}  # unmatched order drops (Mongo unwind)


def test_group_accumulator_variety(spark):
    out = mongo_pipeline(
        _df(spark),
        [
            {"$group": {
                "_id": "$region",
                "avg_p": {"$avg": "$price"},
                "min_p": {"$min": "$price"},
                "max_p": {"$max": "$price"},
                "brands": {"$addToSet": "$brand"},
            }},
            {"$sort": {"_id": 1}},
        ],
    ).collect()
    n = {r._id: r for r in out}
    assert n["N"].avg_p == 20.0 and n["N"].min_p == 10.0 and n["N"].max_p == 30.0
    assert n["N"].brands == ["a", "b"]  # $addToSet sorted for determinism
    assert n["S"].brands == ["a"]


def test_group_by_none_grand_total(spark):
    row = mongo_pipeline(
        _df(spark),
        [{"$group": {"_id": None, "total": {"$sum": "$price"}, "n": {"$count": {}}}}],
    ).collect()[0]
    assert row.total == 100.0 and row.n == 4


def test_match_pushes_to_parquet_scan(spark, sf_smoke):
    """$match through the frontend must reach the scan as PushedFilters —
    the frontend is a plan builder, not an interpreter."""
    from nosql_based_business_intelligence_system_spark.plans.inspect import has_pushed_filters
    from nosql_based_business_intelligence_system_spark.sources.tables import load_table

    out = mongo_pipeline(
        load_table(spark, sf_smoke, "orders"),
        [{"$match": {"o_orderstatus": "O", "o_totalprice": {"$gt": 1000.0}}},
         {"$group": {"_id": "$o_orderpriority", "n": {"$sum": 1}}}],
    )
    assert has_pushed_filters(out, "o_orderstatus", "o_totalprice")


def test_unwind_preserve_null_and_empty(spark):
    """preserveNullAndEmptyArrays -> explode_outer: rows with empty/null
    arrays survive with a NULL element (was a silent inner-drop before)."""
    df = spark.createDataFrame(
        [Row(k=1, xs=[10, 20]), Row(k=2, xs=[]), Row(k=3, xs=None)]
    )
    out = mongo_pipeline(
        df,
        [{"$unwind": {"path": "$xs", "preserveNullAndEmptyArrays": True}}],
    ).collect()
    got = sorted((r.k, r.xs) for r in out)
    assert got == [(1, 10), (1, 20), (2, None), (3, None)]
    # default unwind still drops them
    strict = mongo_pipeline(df, [{"$unwind": "$xs"}]).collect()
    assert sorted((r.k, r.xs) for r in strict) == [(1, 10), (1, 20)]


def test_unwind_unknown_option_raises(spark):
    df = spark.createDataFrame([Row(k=1, xs=[1])])
    with pytest.raises(MongoTranslateError):
        mongo_pipeline(df, [{"$unwind": {"path": "$xs", "arrayIndex": "idx"}}])


def test_unwind_include_array_index(spark):
    df = spark.createDataFrame(
        [Row(k=1, xs=[10, 20]), Row(k=2, xs=[]), Row(k=3, xs=None)]
    )
    out = mongo_pipeline(
        df, [{"$unwind": {"path": "$xs", "includeArrayIndex": "idx"}}]
    ).collect()
    assert sorted((r.k, r.xs, r.idx) for r in out) == [(1, 10, 0), (1, 20, 1)]
    kept = mongo_pipeline(
        df,
        [{"$unwind": {"path": "$xs", "includeArrayIndex": "idx",
                      "preserveNullAndEmptyArrays": True}}],
    ).collect()
    got = sorted(
        (r.k, r.xs, r.idx) for r in kept
    )
    assert got == [(1, 10, 0), (1, 20, 1), (2, None, None), (3, None, None)]


def test_lookup_unwind_with_index_not_fused_but_correct(spark):
    out = mongo_pipeline(
        spark.createDataFrame(ORDERS),
        [
            {"$lookup": {"from": spark.createDataFrame(CUSTS),
                         "localField": "cust", "foreignField": "cid", "as": "c"}},
            {"$unwind": {"path": "$c", "includeArrayIndex": "ci"}},
        ],
    ).collect()
    assert sorted((r.okey, r.c.segment, r.ci) for r in out) == [
        (1, "RETAIL", 0), (2, "RETAIL", 0)
    ]


def test_lookup_unwind_preserve_fuses_to_left_join(spark):
    """Fused $lookup+$unwind honors preserveNullAndEmptyArrays: unmatched
    rows survive with a NULL struct (left join), and the plan still has no
    collect_list round-trip."""
    df = mongo_pipeline(
        spark.createDataFrame(ORDERS),
        [
            {"$lookup": {"from": spark.createDataFrame(CUSTS),
                         "localField": "cust", "foreignField": "cid", "as": "c"}},
            {"$unwind": {"path": "$c", "preserveNullAndEmptyArrays": True}},
        ],
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "collect_list" not in plan
    by_key = {r.okey: r.c for r in df.collect()}
    assert by_key[1].segment == "RETAIL"
    assert by_key[3] is None  # unmatched survives as NULL struct


def test_union_with_pipeline_and_missing_columns(spark):
    a = spark.createDataFrame([Row(k=1, v=10.0)])
    b = spark.createDataFrame([Row(k=2, v=5.0, extra="x"), Row(k=3, v=50.0, extra="y")])
    out = mongo_pipeline(
        a,
        [{"$unionWith": {"coll": b, "pipeline": [{"$match": {"v": {"$gt": 20.0}}}]}}],
    ).collect()
    got = sorted((r.k, r.v, r.extra) for r in out)
    assert got == [(1, 10.0, None), (3, 50.0, "y")]
    with pytest.raises(MongoTranslateError):
        mongo_pipeline(a, [{"$unionWith": {"coll": b, "let": {}}}])


def test_stddev_accumulators(spark):
    out = mongo_pipeline(
        spark.createDataFrame([Row(g="a", x=1.0), Row(g="a", x=3.0)]),
        [{"$group": {"_id": "$g", "sd": {"$stdDevSamp": "$x"},
                     "sdp": {"$stdDevPop": "$x"}}}],
    ).collect()[0]
    assert abs(out.sd - 2.0 ** 0.5) < 1e-12 and abs(out.sdp - 1.0) < 1e-12


def test_skip_requires_sort_and_offsets(spark):
    df = _df(spark)
    out = mongo_pipeline(
        df,
        [{"$sort": {"price": 1}}, {"$skip": 1}, {"$limit": 2}],
    ).collect()
    assert [r.price for r in out] == [20.0, 30.0]
    with pytest.raises(MongoTranslateError, match=r"\$skip"):
        mongo_pipeline(df, [{"$skip": 1}])


def test_facet_multi_pipeline_one_document(spark):
    row = mongo_pipeline(
        _df(spark),
        [
            {"$facet": {
                "by_region": [
                    {"$group": {"_id": "$region", "n": {"$sum": 1}}},
                    {"$sort": {"_id": 1}},
                ],
                "top_prices": [
                    {"$sort": {"price": -1}},
                    {"$limit": 2},
                    {"$project": {"brand": 1, "price": 1}},
                ],
            }},
        ],
    ).collect()[0]
    assert [(f._id, f.n) for f in row.by_region] == [("N", 2), ("S", 2)]
    assert [(f.brand, f.price) for f in row.top_prices] == [("a", 40.0), ("b", 30.0)]
    with pytest.raises(MongoTranslateError):
        mongo_pipeline(_df(spark), [{"$facet": {}}])


def test_sort_by_count(spark):
    out = mongo_pipeline(_df(spark), [{"$sortByCount": "$brand"}]).collect()
    assert [(r._id, r["count"]) for r in out] == [("a", 3), ("b", 1)]


def test_bucket_with_default_and_output(spark):
    out = mongo_pipeline(
        _df(spark),
        [
            {
                "$bucket": {
                    "groupBy": "$price",
                    "boundaries": [0.0, 15.0, 35.0],
                    "default": -1.0,
                    "output": {"n": {"$sum": 1}, "top": {"$max": "$price"}},
                }
            }
        ],
    ).collect()
    got = {r._id: (r.n, r.top) for r in out}
    assert got == {0.0: (1, 10.0), 15.0: (2, 30.0), -1.0: (1, 40.0)}


def test_bucket_without_default_drops_out_of_range(spark):
    out = mongo_pipeline(
        _df(spark),
        [{"$bucket": {"groupBy": "$price", "boundaries": [0.0, 35.0]}}],
    ).collect()
    assert [(r._id, r["count"]) for r in out] == [(0.0, 3)]


def test_bucket_rejects_unsorted_boundaries(spark):
    with pytest.raises(MongoTranslateError):
        mongo_pipeline(
            _df(spark),
            [{"$bucket": {"groupBy": "$price", "boundaries": [10.0, 0.0]}}],
        )


def test_replace_root_promotes_struct(spark):
    from pyspark.sql import functions as F

    df = _df(spark).select(F.struct("region", "qty").alias("inner"), "price")
    out = mongo_pipeline(df, [{"$replaceRoot": {"newRoot": "$inner"}}])
    assert sorted(out.columns) == ["qty", "region"]
    assert out.count() == 4


def test_replace_root_requires_field_ref(spark):
    with pytest.raises(MongoTranslateError):
        mongo_pipeline(_df(spark), [{"$replaceWith": {"bad": 1}}])


def test_bucket_auto_equal_counts(spark):
    rows = [Row(v=float(i)) for i in range(1, 13)]  # 12 distinct values
    out = mongo_pipeline(
        spark.createDataFrame(rows),
        [{"$bucketAuto": {"groupBy": "$v", "buckets": 4}}],
    ).orderBy("_id_min").collect()
    assert [(r._id_min, r._id_max, r["count"]) for r in out] == [
        (1.0, 3.0, 3), (4.0, 6.0, 3), (7.0, 9.0, 3), (10.0, 12.0, 3)
    ]


def test_bucket_auto_never_splits_ties(spark):
    rows = [Row(v=1.0)] * 5 + [Row(v=2.0)] * 1
    out = mongo_pipeline(
        spark.createDataFrame(rows),
        [{"$bucketAuto": {"groupBy": "$v", "buckets": 2}}],
    ).orderBy("_id_min").collect()
    # all five 1.0s share a percent_rank -> same bucket
    assert [(r._id_min, r._id_max, r["count"]) for r in out] == [
        (1.0, 1.0, 5), (2.0, 2.0, 1)
    ]


def test_bucket_auto_rejects_granularity(spark):
    with pytest.raises(MongoTranslateError):
        mongo_pipeline(
            _df(spark),
            [{"$bucketAuto": {"groupBy": "$price", "buckets": 2,
                              "granularity": "R5"}}],
        )


def test_match_regex(spark):
    out = mongo_pipeline(
        _df(spark), [{"$match": {"brand": {"$regex": "^A", "$options": "i"}}}]
    )
    assert out.count() == 3  # brand 'a' rows, case-insensitive
    with pytest.raises(MongoTranslateError):
        mongo_pipeline(_df(spark), [{"$match": {"brand": {"$regex": "a", "$options": "x"}}}])


def test_out_round_trip(spark, tmp_path):
    p = str(tmp_path / "agg_out")
    out = mongo_pipeline(
        _df(spark),
        [
            {"$group": {"_id": "$region", "n": {"$sum": 1}}},
            {"$out": {"path": p, "format": "parquet"}},
        ],
    )
    assert {(r._id, r.n) for r in out.collect()} == {("N", 2), ("S", 2)}
    # the sink really holds the result
    assert {(r._id, r.n) for r in spark.read.parquet(p).collect()} == {("N", 2), ("S", 2)}


def test_out_must_be_final_stage(spark, tmp_path):
    with pytest.raises(MongoTranslateError):
        mongo_pipeline(
            _df(spark),
            [{"$out": {"path": str(tmp_path / "x")}}, {"$limit": 1}],
        )


def test_merge_upsert_replace_insert(spark, tmp_path):
    p = str(tmp_path / "tgt")
    spark.createDataFrame(
        [Row(k=1, v="old1"), Row(k=2, v="old2")]
    ).write.parquet(p)
    out = mongo_pipeline(
        spark.createDataFrame([Row(k=2, v="new2"), Row(k=3, v="new3")]),
        [{"$merge": {"into": {"path": p}, "on": "k"}}],
    )
    assert {(r.k, r.v) for r in out.collect()} == {(1, "old1"), (2, "new2"), (3, "new3")}


def test_merge_keep_existing_discard(spark, tmp_path):
    p = str(tmp_path / "tgt2")
    spark.createDataFrame([Row(k=1, v="old1")]).write.parquet(p)
    out = mongo_pipeline(
        spark.createDataFrame([Row(k=1, v="new1"), Row(k=9, v="new9")]),
        [{"$merge": {"into": {"path": p}, "on": "k",
                     "whenMatched": "keepExisting", "whenNotMatched": "discard"}}],
    )
    assert {(r.k, r.v) for r in out.collect()} == {(1, "old1")}


def test_string_and_math_expr_operators(spark):
    rows = mongo_pipeline(
        _df(spark),
        [{"$project": {
            "up": {"$toUpper": "$brand"},
            "lab": {"$concat": ["$region", {"$literal": "-"}, "$brand"]},
            "head": {"$substrCP": ["$region", 0, 1]},
            "pmod": {"$mod": ["$price", 7.0]},
            "pr": {"$round": ["$price", -1]},
            "pc": {"$ceil": "$price"},
            "ln": {"$strLenCP": "$brand"},
        }}],
    ).collect()
    r = {x.lab: x for x in rows}
    assert r["N-a"].up == "A" and r["N-a"].head == "N" and r["N-a"].ln == 1
    assert r["N-a"].pmod == 3.0 and r["N-a"].pr == 10.0 and r["N-a"].pc == 10


def test_date_expr_operators(spark):
    import datetime

    df = spark.createDataFrame(
        [Row(k=1, d=datetime.datetime(2024, 3, 7, 14, 5, 9))]
    )
    r = mongo_pipeline(
        df,
        [{"$project": {
            "y": {"$year": "$d"}, "m": {"$month": "$d"},
            "dom": {"$dayOfMonth": "$d"}, "h": {"$hour": "$d"},
            "s": {"$dateToString": {"format": "%Y-%m", "date": "$d"}},
        }}],
    ).collect()[0]
    assert (r.y, r.m, r.dom, r.h, r.s) == (2024, 3, 7, 14, "2024-03")
    with pytest.raises(MongoTranslateError):
        mongo_pipeline(
            df,
            [{"$project": {"bad": {"$dateToString": {"format": "%j", "date": "$d"}}}}],
        )


def test_topn_bottomn_accumulators(spark):
    out = mongo_pipeline(
        _df(spark),
        [{"$group": {
            "_id": None,
            "top2": {"$topN": {"n": 2, "sortBy": {"price": -1}, "output": "$brand"}},
            "cheap2": {"$bottomN": {"n": 2, "sortBy": {"price": -1}, "output": "$price"}},
        }}],
    ).collect()[0]
    assert out.top2 == ["a", "b"]        # prices 40, 30
    assert out.cheap2 == [20.0, 10.0]    # last two in desc order, kept in order
    with pytest.raises(MongoTranslateError):
        mongo_pipeline(
            _df(spark),
            [{"$group": {"_id": None,
                         "bad": {"$topN": {"n": 1, "sortBy": {"a": 1, "b": 1},
                                           "output": "$brand"}}}}],
        )


def test_set_window_fields_rank_shift_frames(spark):
    docs = spark.createDataFrame(
        [
            Row(g="a", t=1, v=10.0),
            Row(g="a", t=2, v=20.0),
            Row(g="a", t=3, v=30.0),
            Row(g="b", t=1, v=5.0),
        ]
    )
    out = mongo_pipeline(
        docs,
        [
            {
                "$setWindowFields": {
                    "partitionBy": "$g",
                    "sortBy": {"t": 1},
                    "output": {
                        "seq": {"$documentNumber": {}},
                        "run": {
                            "$sum": "$v",
                            "window": {"documents": ["unbounded", "current"]},
                        },
                        "prev": {"$shift": {"output": "$v", "by": -1}},
                        "nxt": {"$shift": {"output": "$v", "by": 1, "default": -1.0}},
                        "tot": {"$sum": "$v"},  # default window: whole partition
                    },
                }
            }
        ],
    )
    rows = {(r.g, r.t): r for r in out.collect()}
    assert rows[("a", 2)].seq == 2
    assert rows[("a", 2)].run == 30.0
    assert rows[("a", 2)].prev == 10.0
    assert rows[("a", 3)].nxt == -1.0  # default fills past the partition edge
    assert rows[("a", 1)].tot == 60.0  # unbounded default even with sortBy
    assert rows[("b", 1)].seq == 1 and rows[("b", 1)].tot == 5.0


def test_set_window_fields_rejects_bad_specs(spark):
    docs = spark.createDataFrame([Row(g="a", t=1, v=1.0)])
    with pytest.raises(MongoTranslateError, match="requires sortBy"):
        mongo_pipeline(
            docs,
            [{"$setWindowFields": {"partitionBy": "$g",
                                   "output": {"r": {"$rank": {}}}}}],
        )
    with pytest.raises(MongoTranslateError, match="range windows"):
        mongo_pipeline(
            docs,
            [{"$setWindowFields": {"sortBy": {"t": 1},
                                   "output": {"s": {"$sum": "$v",
                                                    "window": {"range": [0, 1]}}}}}],
        )
    with pytest.raises(MongoTranslateError, match="unsupported window operator"):
        mongo_pipeline(
            docs,
            [{"$setWindowFields": {"sortBy": {"t": 1},
                                   "output": {"s": {"$integral": "$v"}}}}],
        )
    with pytest.raises(MongoTranslateError, match="one operator"):
        mongo_pipeline(
            docs,
            [{"$setWindowFields": {"sortBy": {"t": 1},
                                   "output": {"s": {"$sum": "$v", "$avg": "$v"}}}}],
        )


def _org(spark):
    # chain: 1 -> 2 -> 3 -> 4 (reports-to), plus a 2-node cycle 10 <-> 11
    return spark.createDataFrame(
        [
            Row(_id=1, name="ceo", mgr=None),
            Row(_id=2, name="vp", mgr=1),
            Row(_id=3, name="dir", mgr=2),
            Row(_id=4, name="ic", mgr=3),
            Row(_id=10, name="c10", mgr=11),
            Row(_id=11, name="c11", mgr=10),
        ]
    )


def test_graph_lookup_management_chain(spark):
    org = _org(spark)
    out = mongo_pipeline(
        org,
        [
            {
                "$graphLookup": {
                    "from": org,
                    "startWith": "$mgr",
                    "connectFromField": "mgr",
                    "connectToField": "_id",
                    "as": "chain",
                    "depthField": "lvl",
                }
            }
        ],
    )
    rows = {r._id: r for r in out.collect()}
    assert [(c.name, c.lvl) for c in rows[4].chain] == [
        ("dir", 0), ("vp", 1), ("ceo", 2),
    ]
    assert [(c.name, c.lvl) for c in rows[2].chain] == [("ceo", 0)]
    assert rows[1].chain == []  # the CEO reports to nobody
    # cycle: both reached, traversal terminates
    assert sorted(c.name for c in rows[10].chain) == ["c10", "c11"]


def test_graph_lookup_max_depth_bounds_traversal(spark):
    org = _org(spark)
    out = mongo_pipeline(
        org,
        [
            {
                "$graphLookup": {
                    "from": org,
                    "startWith": "$mgr",
                    "connectFromField": "mgr",
                    "connectToField": "_id",
                    "as": "chain",
                    "maxDepth": 0,
                }
            }
        ],
    )
    rows = {r._id: r for r in out.collect()}
    assert [c.name for c in rows[4].chain] == ["dir"]  # depth 0 only
    assert "lvl" not in (rows[4].chain[0].asDict() if rows[4].chain else {})


def test_graph_lookup_requires_ids(spark):
    no_id = spark.createDataFrame([(1, None)], "a int, mgr int")
    with pytest.raises(MongoTranslateError, match="_id"):
        mongo_pipeline(
            no_id,
            [
                {
                    "$graphLookup": {
                        "from": no_id,
                        "startWith": "$mgr",
                        "connectFromField": "mgr",
                        "connectToField": "a",
                        "as": "x",
                    }
                }
            ],
        )


def test_lookup_with_uncorrelated_pipeline(spark):
    left = spark.createDataFrame([Row(k=1, n="l1"), Row(k=2, n="l2")])
    right = spark.createDataFrame(
        [Row(fk=1, v=5.0), Row(fk=1, v=50.0), Row(fk=2, v=7.0)]
    )
    out = mongo_pipeline(
        left,
        [
            {
                "$lookup": {
                    "from": right,
                    "localField": "k",
                    "foreignField": "fk",
                    "as": "m",
                    "pipeline": [{"$match": {"v": {"$gte": 10.0}}}],
                }
            }
        ],
    )
    rows = {r.k: [e.v for e in r.m] for r in out.collect()}
    assert rows == {1: [50.0], 2: []}  # filtered build side; empty array kept
    with pytest.raises(MongoTranslateError, match="let"):
        mongo_pipeline(
            left,
            [
                {
                    "$lookup": {
                        "from": right,
                        "localField": "k",
                        "foreignField": "fk",
                        "as": "m",
                        "let": {"x": "$k"},
                    }
                }
            ],
        )
    with pytest.raises(MongoTranslateError, match="missing after pipeline"):
        mongo_pipeline(
            left,
            [
                {
                    "$lookup": {
                        "from": right,
                        "localField": "k",
                        "foreignField": "fk",
                        "as": "m",
                        "pipeline": [{"$project": {"v": 1}}],
                    }
                }
            ],
        )


def test_densify_and_fill_stages(spark):
    import datetime as dt

    from pyspark.sql import functions as F

    h = lambda i: dt.datetime(2024, 1, 1) + dt.timedelta(hours=i)  # noqa: E731
    df = spark.createDataFrame(
        [Row(k="a", ts=h(0), v=10.0), Row(k="a", ts=h(4), v=50.0)]
    )
    out = mongo_pipeline(
        df,
        [
            {
                "$densify": {
                    "field": "ts",
                    "partitionByFields": ["k"],
                    "range": {"step": 1, "unit": "hour", "bounds": "partition"},
                }
            },
            {
                "$fill": {
                    "partitionByFields": ["k"],
                    "sortBy": {"ts": 1},
                    "output": {"v": {"method": "linear"}},
                }
            },
        ],
    )
    vals = [r.v for r in out.orderBy("ts").collect()]
    assert vals == [10.0, 20.0, 30.0, 40.0, 50.0]
    const = mongo_pipeline(
        df.withColumn("v", F.when(F.col("v") > 20, F.col("v"))),
        [{"$fill": {"output": {"v": {"value": 0.0}}}}],
    )
    assert sorted(r.v for r in const.collect()) == [0.0, 50.0]
    with pytest.raises(MongoTranslateError, match="unit"):
        mongo_pipeline(
            df,
            [{"$densify": {"field": "ts", "range": {"step": 1, "unit": "month"}}}],
        )
    with pytest.raises(MongoTranslateError, match="ascending"):
        mongo_pipeline(
            df, [{"$fill": {"output": {"v": {"method": "locf"}}}}]
        )


def test_switch_expression_branch_order(spark):
    out = mongo_pipeline(
        _df(spark),
        [
            {
                "$project": {
                    "brand": 1,
                    "tier": {
                        "$switch": {
                            "branches": [
                                {"case": {"$gte": ["$price", 40.0]}, "then": "high"},
                                {"case": {"$gte": ["$price", 20.0]}, "then": "mid"},
                            ],
                            "default": "low",
                        }
                    },
                }
            }
        ],
    ).collect()
    tiers = sorted((r.brand, r.tier) for r in out)
    assert tiers == [("a", "high"), ("a", "low"), ("a", "mid"), ("b", "mid")]


def test_switch_without_default_yields_null(spark):
    out = mongo_pipeline(
        _df(spark),
        [
            {
                "$project": {
                    "t": {
                        "$switch": {
                            "branches": [
                                {"case": {"$gte": ["$price", 40.0]}, "then": 1}
                            ]
                        }
                    }
                }
            }
        ],
    ).collect()
    assert sorted(r.t for r in out if r.t is not None) == [1]
    assert sum(1 for r in out if r.t is None) == 3


def test_switch_rejects_bad_specs(spark):
    with pytest.raises(MongoTranslateError, match="branches"):
        mongo_pipeline(_df(spark), [{"$project": {"t": {"$switch": {}}}}])
    with pytest.raises(MongoTranslateError, match="case/then"):
        mongo_pipeline(
            _df(spark),
            [{"$project": {"t": {"$switch": {"branches": [{"case": True}]}}}}],
        )


def test_date_trunc_month(spark):
    import datetime

    df = spark.createDataFrame(
        [
            Row(k=1, ts=datetime.datetime(2024, 3, 17, 14, 30)),
            Row(k=2, ts=datetime.datetime(2024, 3, 2, 1, 0)),
            Row(k=3, ts=datetime.datetime(2024, 4, 1, 0, 0)),
        ]
    )
    out = mongo_pipeline(
        df,
        [
            {"$project": {"m": {"$dateTrunc": {"date": "$ts", "unit": "month"}}}},
            {"$group": {"_id": "$m", "n": {"$sum": 1}}},
        ],
    ).collect()
    got = {r._id.strftime("%Y-%m-%d"): r.n for r in out}
    assert got == {"2024-03-01": 2, "2024-04-01": 1}


def test_date_trunc_rejects_week_and_options(spark):
    df = _df(spark)
    with pytest.raises(MongoTranslateError, match="unit"):
        mongo_pipeline(
            df, [{"$project": {"t": {"$dateTrunc": {"date": "$price", "unit": "week"}}}}]
        )
    with pytest.raises(MongoTranslateError, match="options"):
        mongo_pipeline(
            df,
            [{"$project": {"t": {"$dateTrunc": {
                "date": "$price", "unit": "day", "timezone": "UTC"
            }}}}],
        )


def test_min_max_n_accumulators(spark):
    out = mongo_pipeline(
        _df(spark),
        [
            {
                "$group": {
                    "_id": "$region",
                    "lo2": {"$minN": {"input": "$price", "n": 2}},
                    "hi2": {"$maxN": {"input": "$price", "n": 2}},
                }
            }
        ],
    ).collect()
    got = {r._id: (list(r.lo2), list(r.hi2)) for r in out}
    assert got["N"] == ([10.0, 30.0], [30.0, 10.0])
    assert got["S"] == ([20.0, 40.0], [40.0, 20.0])


def test_min_max_n_excludes_nulls(spark):
    out = mongo_pipeline(
        _df(spark),
        [{"$group": {"_id": None, "qlo": {"$minN": {"input": "$qty", "n": 10}}}}],
    ).collect()[0]
    assert list(out.qlo) == [1.0, 2.0, 5.0]  # the NULL qty row is excluded


def test_median_accumulator_exact(spark):
    out = mongo_pipeline(
        _df(spark),
        [{"$group": {"_id": None, "m": {"$median": {"input": "$price"}}}}],
    ).collect()[0]
    assert out.m == 25.0  # exact interpolated median of 10,20,30,40
    with pytest.raises(MongoTranslateError, match="options"):
        mongo_pipeline(
            _df(spark),
            [{"$group": {"_id": None, "m": {"$median": {"input": "$price", "x": 1}}}}],
        )


# --- correlated $lookup ------------------------------------------------------

ORDERS_DOCS = [
    Row(ok=1, cust="a", total=100.0),
    Row(ok=2, cust="b", total=50.0),
    Row(ok=3, cust="a", total=10.0),
]
LINES_DOCS = [
    Row(lok=1, item="x", price=60.0),
    Row(lok=1, item="y", price=40.0),
    Row(lok=2, item="x", price=50.0),
    Row(lok=9, item="z", price=1.0),
]


def test_correlated_lookup_eq_and_bound(spark):
    orders = spark.createDataFrame(ORDERS_DOCS)
    lines = spark.createDataFrame(LINES_DOCS)
    out = mongo_pipeline(
        orders,
        [
            {
                "$lookup": {
                    "from": lines,
                    "let": {"o": "$ok", "t": "$total"},
                    "pipeline": [
                        {
                            "$match": {
                                "$expr": {
                                    "$and": [
                                        {"$eq": ["$lok", "$$o"]},
                                        {"$lt": ["$price", "$$t"]},
                                    ]
                                }
                            }
                        }
                    ],
                    "as": "li",
                }
            },
            {"$unwind": "$li"},
        ],
    ).collect()
    got = sorted((r.ok, r.li.item, r.li.price) for r in out)
    # order 1 (total 100): both lines qualify; order 2 (total 50): its
    # only line has price == total, $lt excludes it; order 3: no lines
    assert got == [(1, "x", 60.0), (1, "y", 40.0)]


def test_correlated_lookup_preserve_gives_null_struct(spark):
    orders = spark.createDataFrame(ORDERS_DOCS)
    lines = spark.createDataFrame(LINES_DOCS)
    out = mongo_pipeline(
        orders,
        [
            {
                "$lookup": {
                    "from": lines,
                    "let": {"o": "$ok"},
                    "pipeline": [
                        {"$match": {"$expr": {"$eq": ["$lok", "$$o"]}}}
                    ],
                    "as": "li",
                }
            },
            {"$unwind": {"path": "$li", "preserveNullAndEmptyArrays": True}},
        ],
    ).collect()
    by_ok = {}
    for r in out:
        by_ok.setdefault(r.ok, []).append(r.li)
    assert len(by_ok[1]) == 2 and all(v is not None for v in by_ok[1])
    assert by_ok[3] == [None]  # unmatched -> NULL struct, not struct of NULLs


def test_correlated_lookup_post_match_stage_filters_build_side(spark):
    orders = spark.createDataFrame(ORDERS_DOCS)
    lines = spark.createDataFrame(LINES_DOCS)
    out = mongo_pipeline(
        orders,
        [
            {
                "$lookup": {
                    "from": lines,
                    "let": {"o": "$ok"},
                    "pipeline": [
                        {"$match": {"$expr": {"$eq": ["$lok", "$$o"]}}},
                        {"$match": {"item": "x"}},
                    ],
                    "as": "li",
                }
            },
            {"$unwind": "$li"},
        ],
    ).collect()
    assert sorted((r.ok, r.li.item) for r in out) == [(1, "x"), (2, "x")]


def test_correlated_lookup_loud_errors(spark):
    orders = spark.createDataFrame(ORDERS_DOCS)
    lines = spark.createDataFrame(LINES_DOCS)
    base = {
        "from": lines,
        "let": {"o": "$ok"},
        "pipeline": [{"$match": {"$expr": {"$eq": ["$lok", "$$o"]}}}],
        "as": "li",
    }
    # without $unwind fusion: raises (array group-back needs row identity)
    with pytest.raises(MongoTranslateError, match="unwind"):
        mongo_pipeline(orders, [{"$lookup": base}])
    # $$ refs outside the first $match: raise
    bad = dict(base, pipeline=base["pipeline"] + [
        {"$match": {"$expr": {"$eq": ["$item", "$$o"]}}}
    ])
    with pytest.raises(MongoTranslateError, match=r"\$\$"):
        mongo_pipeline(orders, [{"$lookup": bad}, {"$unwind": "$li"}])
    # non-distributing stage after the match: raise
    bad2 = dict(base, pipeline=base["pipeline"] + [{"$limit": 1}])
    with pytest.raises(MongoTranslateError, match="distribute"):
        mongo_pipeline(orders, [{"$lookup": bad2}, {"$unwind": "$li"}])
    # unknown let var
    bad3 = dict(base, pipeline=[{"$match": {"$expr": {"$eq": ["$lok", "$$zz"]}}}])
    with pytest.raises(MongoTranslateError, match="let var"):
        mongo_pipeline(orders, [{"$lookup": bad3}, {"$unwind": "$li"}])


def test_collection_catalog_resolves_names(spark):
    left = spark.createDataFrame([Row(k=1, n="l1"), Row(k=2, n="l2")])
    right = spark.createDataFrame([Row(fk=1, v=5.0), Row(fk=2, v=7.0)])
    extra = spark.createDataFrame([Row(k=9, n="x")])
    cat = {"rights": right, "extras": extra}
    out = mongo_pipeline(
        left,
        [
            {"$lookup": {"from": "rights", "localField": "k",
                         "foreignField": "fk", "as": "m"}},
            {"$unwind": "$m"},
            {"$project": {"k": 1, "v": "$m.v"}},
            {"$unionWith": {"coll": "extras",
                            "pipeline": [{"$project": {"k": 1, "v": {"$literal": 0.0}}}]}},
        ],
        collections=cat,
    )
    assert {(r.k, r.v) for r in out.collect()} == {(1, 5.0), (2, 7.0), (9, 0.0)}
    # bare-string shorthand
    out2 = mongo_pipeline(
        left.select("k"),
        [{"$unionWith": "extras"}],
        collections={"extras": extra.select("k")},
    )
    assert sorted(r.k for r in out2.collect()) == [1, 2, 9]


def test_collection_catalog_unknown_name_raises(spark):
    left = spark.createDataFrame([Row(k=1)])
    with pytest.raises(MongoTranslateError, match="unknown collection"):
        mongo_pipeline(
            left,
            [{"$lookup": {"from": "nope", "localField": "k",
                          "foreignField": "k", "as": "m"}}],
            collections={},
        )


def test_catalog_leaves_user_field_named_from_alone(spark):
    df = spark.createDataFrame([Row(**{"from": "a"}), Row(**{"from": "b"})])
    out = mongo_pipeline(
        df, [{"$match": {"from": "a"}}], collections={"a": df}
    )
    assert [r["from"] for r in out.collect()] == ["a"]
