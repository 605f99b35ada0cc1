"""MongoDB aggregation-pipeline translator: the reference's implied query
surface, compiled to DataFrame plans.

The reference's endgame is three MongoDB collections plus printed
``mongoimport`` commands (Project.py:367-395,420-423) — the analytical
queries its dashboard would issue against db ``clearvue_proto`` are Mongo
aggregation pipelines. This module lets those users run the SAME pipeline
shape on Spark: a list-of-stage-dicts compiles to DataFrame operators, so
Catalyst plans it like any native query (pushdown, broadcast, AQE all
apply — the pipeline is a frontend, not an interpreter).

Supported stages (the analytical core of the language):
``$match`` (equality, $gt/$gte/$lt/$lte/$ne/$in/$nin, $and/$or/$not,
$exists), ``$project`` (include/exclude/rename), ``$addFields``/``$set``
(arithmetic: $add/$subtract/$multiply/$divide, $cond, $ifNull, literals),
``$group`` (_id scalar/compound/None; $sum/$avg/$min/$max/$count/$first
/$last/$push/$addToSet/$stdDevPop/$stdDevSamp), ``$sort``, ``$limit``,
``$skip`` (only directly after ``$sort`` — unordered skip is
nondeterministic and raises), ``$unwind`` (including
``preserveNullAndEmptyArrays``), ``$count``, ``$lookup`` (fused with a
following ``$unwind`` into a single join; uncorrelated ``pipeline``
pre-shapes the build side before the join), ``$unionWith``, ``$facet``,
``$setWindowFields`` ($rank/$denseRank/$documentNumber/$shift + framed
accumulators over ``documents`` windows -> Spark window functions),
``$graphLookup`` (BFS as one equi-join per level, cycle-safe,
``maxDepth``-bounded or loud fixpoint cap), ``$densify``/``$fill``
(tick scaffold + locf/linear/constant gap-fill via operators/fill.py).

Unsupported constructs raise ``MongoTranslateError`` eagerly — a silent
wrong answer is worse than a loud unsupported one.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class MongoTranslateError(ValueError):
    pass


# --- expressions -----------------------------------------------------------

_ARITH = {
    "$add": lambda args: _fold(args, lambda a, b: a + b),
    "$subtract": lambda args: _binary(args, lambda a, b: a - b, "$subtract"),
    "$multiply": lambda args: _fold(args, lambda a, b: a * b),
    "$divide": lambda args: _binary(args, lambda a, b: a / b, "$divide"),
}


def _fold(args: list, op) -> Column:
    cols = [expr(a) for a in args]
    out = cols[0]
    for c in cols[1:]:
        out = op(out, c)
    return out


def _binary(args: list, op, name: str) -> Column:
    if len(args) != 2:
        raise MongoTranslateError(f"{name} takes exactly 2 args, got {len(args)}")
    return op(expr(args[0]), expr(args[1]))


def expr(e: Any) -> Column:
    """Compile a Mongo expression ("$field", literal, or operator dict)."""
    if isinstance(e, str) and e.startswith("$"):
        return F.col(e[1:])
    if isinstance(e, dict):
        if len(e) != 1:
            raise MongoTranslateError(f"expression must have one operator: {e}")
        (op, args), = e.items()
        if op in _ARITH:
            return _ARITH[op](args)
        if op == "$cond":
            if isinstance(args, dict):
                args = [args["if"], args["then"], args["else"]]
            return F.when(predicate_expr(args[0]), expr(args[1])).otherwise(
                expr(args[2])
            )
        if op == "$ifNull":
            return F.coalesce(expr(args[0]), expr(args[1]))
        if op == "$literal":
            return F.lit(args)
        if op in _UNARY:
            return _UNARY[op](expr(args))
        if op == "$concat":
            return F.concat(*[expr(a) for a in args])
        if op == "$substrCP":
            # Mongo is 0-based; Spark substring is 1-based
            return F.substring(
                expr(args[0]), F.lit(int(args[1]) + 1), F.lit(int(args[2]))
            )
        if op == "$mod":
            return expr(args[0]) % expr(args[1])
        if op == "$round":
            places = int(args[1]) if isinstance(args, list) and len(args) > 1 else 0
            return F.round(expr(args[0] if isinstance(args, list) else args), places)
        if op == "$dateToString":
            return _date_to_string(args)
        if op == "$switch":
            return _switch(args)
        if op == "$dateTrunc":
            return _date_trunc(args)
        raise MongoTranslateError(f"unsupported expression operator {op!r}")
    return F.lit(e)


#: Single-argument expression operators (string/date/math/cast).
def _switch(spec: Any) -> Column:
    """$switch -> chained WHEN. Branches evaluate in order, as in Mongo;
    a missing ``default`` yields NULL only if no branch matches at
    runtime — Mongo errors there, but compiling that would need a
    per-row guard, so the (documented) difference is NULL instead."""
    if not (isinstance(spec, dict) and isinstance(spec.get("branches"), list)):
        raise MongoTranslateError("$switch requires {branches: [...]}")
    unknown = set(spec) - {"branches", "default"}
    if unknown:
        raise MongoTranslateError(
            f"unsupported $switch options {sorted(unknown)!r}"
        )
    out: Column | None = None
    for br in spec["branches"]:
        if not (isinstance(br, dict) and "case" in br and "then" in br):
            raise MongoTranslateError(f"$switch branch needs case/then: {br!r}")
        cond, then = predicate_expr(br["case"]), expr(br["then"])
        out = F.when(cond, then) if out is None else out.when(cond, then)
    if out is None:
        raise MongoTranslateError("$switch requires at least one branch")
    return out.otherwise(expr(spec["default"])) if "default" in spec else out


#: $dateTrunc units with identical Spark semantics. "week" is excluded:
#: Mongo's default startOfWeek is Sunday, Spark's date_trunc week is
#: ISO-Monday — silently different answers, so it raises instead.
_DATE_TRUNC_UNITS = {
    "year", "quarter", "month", "day", "hour", "minute", "second",
}


def _date_trunc(spec: Any) -> Column:
    if not (isinstance(spec, dict) and "date" in spec and "unit" in spec):
        raise MongoTranslateError("$dateTrunc requires {date, unit}")
    unknown = set(spec) - {"date", "unit"}
    if unknown:
        # binSize/timezone/startOfWeek change bucket boundaries — loud no.
        raise MongoTranslateError(
            f"unsupported $dateTrunc options {sorted(unknown)!r}"
        )
    unit = spec["unit"]
    if unit not in _DATE_TRUNC_UNITS:
        raise MongoTranslateError(f"unsupported $dateTrunc unit {unit!r}")
    return F.date_trunc(unit, expr(spec["date"]))


_UNARY = {
    "$toLower": F.lower,
    "$toUpper": F.upper,
    "$trim": lambda c: F.trim(c),
    "$strLenCP": lambda c: F.length(c).cast("int"),
    "$abs": F.abs,
    "$ceil": lambda c: F.ceil(c).cast("bigint"),
    "$floor": lambda c: F.floor(c).cast("bigint"),
    "$year": lambda c: F.year(c).cast("int"),
    "$month": lambda c: F.month(c).cast("int"),
    "$dayOfMonth": lambda c: F.dayofmonth(c).cast("int"),
    "$hour": lambda c: F.hour(c).cast("int"),
    "$toString": lambda c: c.cast("string"),
    "$toInt": lambda c: c.cast("int"),
    "$toLong": lambda c: c.cast("bigint"),
    "$toDouble": lambda c: c.cast("double"),
    # Mongo decimal128 -> the engine's money decimal; makes $sum windows
    # order-independent (same reason as functions/cleaning.dsum)
    "$toDecimal": lambda c: c.cast("decimal(38,6)"),
}

#: Mongo strftime-style tokens -> Spark datetime pattern (only the
#: unambiguous subset; anything else raises rather than silently differs).
_DATE_FMT = {"%Y": "yyyy", "%m": "MM", "%d": "dd", "%H": "HH", "%M": "mm", "%S": "ss"}


def _date_to_string(args: Any) -> Column:
    if not (isinstance(args, dict) and "date" in args and "format" in args):
        raise MongoTranslateError(
            f"$dateToString requires {{format, date}}: {args!r}"
        )
    unknown = set(args) - {"date", "format"}
    if unknown:
        raise MongoTranslateError(
            f"unsupported $dateToString options {sorted(unknown)!r}"
        )
    fmt = args["format"]
    out = ""
    i = 0
    while i < len(fmt):
        if fmt[i] == "%":
            tok = fmt[i : i + 2]
            if tok not in _DATE_FMT:
                raise MongoTranslateError(f"unsupported $dateToString token {tok!r}")
            out += _DATE_FMT[tok]
            i += 2
        elif fmt[i].isalpha():
            out += f"'{fmt[i]}'"  # literal letters must be quoted in Spark patterns
            i += 1
        else:
            out += fmt[i]
            i += 1
    return F.date_format(expr(args["date"]), out)


def predicate_expr(e: Any) -> Column:
    """A $cond condition: comparison-operator dict over expressions."""
    if isinstance(e, dict) and len(e) == 1:
        (op, args), = e.items()
        cmps = {
            "$gt": lambda a, b: a > b, "$gte": lambda a, b: a >= b,
            "$lt": lambda a, b: a < b, "$lte": lambda a, b: a <= b,
            "$eq": lambda a, b: a == b, "$ne": lambda a, b: a != b,
        }
        if op in cmps:
            return cmps[op](expr(args[0]), expr(args[1]))
    raise MongoTranslateError(f"unsupported condition {e!r}")


# --- $match ----------------------------------------------------------------

_CMP = {
    "$gt": lambda c, v: c > F.lit(v),
    "$gte": lambda c, v: c >= F.lit(v),
    "$lt": lambda c, v: c < F.lit(v),
    "$lte": lambda c, v: c <= F.lit(v),
    "$ne": lambda c, v: c != F.lit(v),
    "$eq": lambda c, v: c == F.lit(v),
    "$in": lambda c, v: c.isin(*v),
    "$nin": lambda c, v: ~c.isin(*v),
    "$exists": lambda c, v: c.isNotNull() if v else c.isNull(),
}


def match_filter(q: dict) -> Column:
    """Compile a $match document to one boolean Column (implicit AND)."""
    parts: list[Column] = []
    for k, v in q.items():
        if k == "$and":
            parts.append(_fold_bool([match_filter(s) for s in v], lambda a, b: a & b))
        elif k == "$or":
            parts.append(_fold_bool([match_filter(s) for s in v], lambda a, b: a | b))
        elif k == "$not":
            parts.append(~match_filter(v))
        elif k.startswith("$"):
            raise MongoTranslateError(f"unsupported $match operator {k!r}")
        elif isinstance(v, dict):
            if "$regex" in v:
                unknown = set(v) - {"$regex", "$options"}
                if unknown:
                    raise MongoTranslateError(
                        f"cannot mix $regex with {sorted(unknown)!r}"
                    )
                opts = v.get("$options", "")
                bad = set(opts) - set("ims")
                if bad:
                    # 'x' (extended) has subtly different whitespace rules
                    # in Java regex; refuse rather than silently differ
                    raise MongoTranslateError(
                        f"unsupported $regex options {sorted(bad)!r}"
                    )
                pattern = (f"(?{opts})" if opts else "") + v["$regex"]
                parts.append(F.col(k).rlike(pattern))
                continue
            for op, val in v.items():
                if op not in _CMP:
                    raise MongoTranslateError(f"unsupported comparator {op!r}")
                parts.append(_CMP[op](F.col(k), val))
        else:
            parts.append(F.col(k) == F.lit(v))
    if not parts:
        return F.lit(True)
    return _fold_bool(parts, lambda a, b: a & b)


def _fold_bool(cols: list[Column], op) -> Column:
    out = cols[0]
    for c in cols[1:]:
        out = op(out, c)
    return out


# --- $group ----------------------------------------------------------------

_ACCUM = {
    "$sum": lambda a: F.sum(a) if a is not None else None,
    "$avg": lambda a: F.avg(a),
    "$min": lambda a: F.min(a),
    "$max": lambda a: F.max(a),
    "$first": lambda a: F.first(a),
    "$last": lambda a: F.last(a),
    "$push": lambda a: F.collect_list(a),
    "$addToSet": lambda a: F.array_sort(F.collect_set(a)),
    "$count": lambda a: F.count(F.lit(1)),
    "$stdDevPop": lambda a: F.stddev_pop(a),
    "$stdDevSamp": lambda a: F.stddev_samp(a),
}


def _top_bottom_n(op: str, arg: Any) -> Column:
    """$topN/$bottomN: sortBy-defined extremes as an array (single sort
    key; scalar outputs — the struct sort uses the output as tie-break,
    which keeps the result deterministic). Collect-then-sort per group:
    fine when n << group size and the collected pair is narrow."""
    for k in ("n", "sortBy", "output"):
        if not (isinstance(arg, dict) and k in arg):
            raise MongoTranslateError(f"{op} requires {{n, sortBy, output}}")
    if len(arg["sortBy"]) != 1:
        raise MongoTranslateError(f"{op} supports a single sortBy key")
    (field, direction), = arg["sortBy"].items()
    n = int(arg["n"])
    pairs = F.array_sort(
        F.collect_list(F.struct(F.col(field).alias("k"), expr(arg["output"]).alias("v")))
    )
    if direction == -1:
        pairs = F.reverse(pairs)
    if op == "$topN":
        chosen = F.slice(pairs, 1, n)
    else:  # $bottomN: the LAST n in sort order, kept in sort order
        chosen = F.reverse(F.slice(F.reverse(pairs), 1, n))
    return F.transform(chosen, lambda s: s["v"])


def _min_max_n(op: str, arg: Any) -> Column:
    """$minN/$maxN: the n smallest/largest values of the input expression
    as a sorted array (NULLs excluded, as in Mongo). Collect-then-sort
    per group, like $topN."""
    if not (isinstance(arg, dict) and "n" in arg and "input" in arg):
        raise MongoTranslateError(f"{op} requires {{input, n}}")
    n = int(arg["n"])
    vals = F.array_sort(
        F.filter(F.collect_list(expr(arg["input"])), lambda v: v.isNotNull())
    )
    if op == "$maxN":
        # largest n, returned largest-first (Mongo order)
        return F.slice(F.reverse(vals), 1, n)
    return F.slice(vals, 1, n)


def _accumulator(name: str, spec: Any) -> Column:
    if not (isinstance(spec, dict) and len(spec) == 1):
        raise MongoTranslateError(f"accumulator for {name!r} must be one-op dict")
    (op, arg), = spec.items()
    if op in ("$topN", "$bottomN"):
        return _top_bottom_n(op, arg).alias(name)
    if op in ("$minN", "$maxN"):
        return _min_max_n(op, arg).alias(name)
    if op == "$median":
        # Mongo 7 defaults to approximate t-digest; this engine computes
        # the EXACT median (Spark percentile) — documented strictly-more-
        # accurate difference, matching the module's no-silent-drift bar.
        if isinstance(arg, dict):
            if set(arg) - {"input", "method"}:
                raise MongoTranslateError(
                    f"unsupported $median options {sorted(set(arg) - {'input', 'method'})!r}"
                )
            arg = arg["input"]
        return F.percentile(expr(arg), F.lit(0.5)).alias(name)
    if op not in _ACCUM:
        raise MongoTranslateError(f"unsupported accumulator {op!r}")
    if op == "$sum" and not isinstance(arg, str) and not isinstance(arg, dict):
        # {"$sum": 1} -> count
        return (F.count(F.lit(1)) * F.lit(arg)).alias(name) if arg != 1 else F.count(
            F.lit(1)
        ).alias(name)
    if op == "$count":
        return F.count(F.lit(1)).alias(name)
    return _ACCUM[op](expr(arg)).alias(name)


def _apply_group(df: DataFrame, spec: dict) -> DataFrame:
    if "_id" not in spec:
        raise MongoTranslateError("$group requires _id")
    gid = spec["_id"]
    aggs = [_accumulator(k, v) for k, v in spec.items() if k != "_id"]
    if gid is None:
        return df.agg(*aggs)
    if isinstance(gid, str) and gid.startswith("$"):
        return (
            df.groupBy(expr(gid).alias("_id")).agg(*aggs)
        )
    if isinstance(gid, dict):
        keys = [expr(v).alias(k) for k, v in gid.items()]
        return df.groupBy(*keys).agg(*aggs)
    raise MongoTranslateError(f"unsupported _id {gid!r}")


# --- pipeline --------------------------------------------------------------


def mongo_find(
    df: DataFrame,
    filter: dict | None = None,
    projection: dict | None = None,
    sort: dict | None = None,
    limit: int | None = None,
) -> DataFrame:
    """``db.collection.find(filter, projection).sort(...).limit(n)`` — the
    CRUD-side read surface, expressed through the same stage compiler."""
    pipeline: list[dict] = []
    if filter:
        pipeline.append({"$match": filter})
    if projection:
        pipeline.append({"$project": projection})
    if sort:
        pipeline.append({"$sort": sort})
    if limit is not None:
        pipeline.append({"$limit": limit})
    return mongo_pipeline(df, pipeline)


def _unwind_spec(spec: Any) -> tuple[str, bool, str | None]:
    """Parse a $unwind spec -> (field path, preserveNullAndEmptyArrays,
    includeArrayIndex name or None). Unknown keys raise — the module's
    policy is a loud unsupported, never a silently-different answer.
    """
    if isinstance(spec, str):
        path, preserve, idx = spec, False, None
    elif isinstance(spec, dict):
        unknown = set(spec) - {
            "path", "preserveNullAndEmptyArrays", "includeArrayIndex"
        }
        if unknown:
            raise MongoTranslateError(
                f"unsupported $unwind options {sorted(unknown)!r}"
            )
        if "path" not in spec:
            raise MongoTranslateError("$unwind dict spec requires 'path'")
        path = spec["path"]
        preserve = bool(spec.get("preserveNullAndEmptyArrays", False))
        idx = spec.get("includeArrayIndex")
        if idx is not None and not isinstance(idx, str):
            raise MongoTranslateError(
                f"includeArrayIndex must be a field name: {idx!r}"
            )
    else:
        raise MongoTranslateError(f"unsupported $unwind spec {spec!r}")
    if not (isinstance(path, str) and path.startswith("$")):
        raise MongoTranslateError(f"$unwind path must be a '$field' string: {path!r}")
    return path[1:], preserve, idx


_EXPR_CMP = {
    "$eq": lambda a, b: a == b,
    "$gt": lambda a, b: a > b,
    "$gte": lambda a, b: a >= b,
    "$lt": lambda a, b: a < b,
    "$lte": lambda a, b: a <= b,
}


def _compile_lookup_expr(cond, let_cols, right_col) -> Column:
    """Compile a correlated $expr: '$$var' binds to the let-captured LEFT
    column, '$field' resolves through ``right_col`` (a name -> Column
    binder for the joined collection) — qualified binding, so same-named
    columns can't silently cross-bind."""

    def operand(o):
        if isinstance(o, str) and o.startswith("$$"):
            var = o[2:]
            if var not in let_cols:
                raise MongoTranslateError(f"$expr references unknown let var {o!r}")
            return let_cols[var]
        if isinstance(o, str) and o.startswith("$"):
            return right_col(o[1:])
        if isinstance(o, dict):
            raise MongoTranslateError(
                f"unsupported operand in correlated $expr: {o!r}"
            )
        return F.lit(o)

    if not (isinstance(cond, dict) and len(cond) == 1):
        raise MongoTranslateError(f"$expr must have one operator: {cond!r}")
    (op, args), = cond.items()
    if op == "$and":
        out = None
        for c in args:
            compiled = _compile_lookup_expr(c, let_cols, right_col)
            out = compiled if out is None else (out & compiled)
        if out is None:
            raise MongoTranslateError("$and requires at least one condition")
        return out
    if op in _EXPR_CMP and isinstance(args, list) and len(args) == 2:
        return _EXPR_CMP[op](operand(args[0]), operand(args[1]))
    raise MongoTranslateError(f"unsupported correlated $expr operator {op!r}")


def _apply_correlated_lookup(
    df: DataFrame, spec: dict, unwound: bool, preserve: bool
) -> DataFrame:
    """Correlated ``let``/``$expr`` $lookup, fused with $unwind.

    The pipeline's FIRST stage must be ``{"$match": {"$expr": ...}}``;
    its comparisons become the JOIN CONDITION (so Catalyst plans an
    equi-join when the $expr is equality-shaped, with non-equi terms as
    join filters — never a per-row subquery). Stages after the match may
    not reference ``$$`` variables and are applied to the joined
    collection BEFORE the join (only stages that distribute over groups
    are safe there; $sort/$limit/$group raise).

    Without an immediately following $unwind this raises: grouping the
    matches back into an array needs a row identity the frontend won't
    invent silently.
    """
    for k in ("from", "let", "pipeline", "as"):
        if k not in spec:
            raise MongoTranslateError(f"$lookup with let requires {k!r}")
    unknown = set(spec) - {"from", "let", "pipeline", "as"}
    if unknown:
        raise MongoTranslateError(
            f"unsupported correlated $lookup options {sorted(unknown)!r} "
            "(let-form takes no localField/foreignField)"
        )
    if not unwound:
        raise MongoTranslateError(
            "correlated $lookup must be immediately followed by $unwind of "
            "its 'as' field (array group-back needs a row identity)"
        )
    other = spec["from"]
    if not isinstance(other, DataFrame):
        raise MongoTranslateError("$lookup 'from' must be a DataFrame collection")
    pipeline = list(spec["pipeline"])
    if not (
        pipeline
        and isinstance(pipeline[0], dict)
        and set(pipeline[0]) == {"$match"}
        and isinstance(pipeline[0]["$match"], dict)
        and set(pipeline[0]["$match"]) == {"$expr"}
    ):
        raise MongoTranslateError(
            "correlated $lookup pipeline must start with {'$match': {'$expr': ...}}"
        )
    rest = pipeline[1:]
    import json

    if any("$$" in json.dumps(stage) for stage in rest):
        raise MongoTranslateError(
            "only the first $match may reference let ($$) variables"
        )
    for stage in rest:
        if set(stage) & {"$sort", "$limit", "$skip", "$group"}:
            raise MongoTranslateError(
                f"stage {sorted(stage)!r} after the correlated $match does "
                "not distribute over join groups — move it before $lookup "
                "or restructure"
            )
    if rest:
        other = mongo_pipeline(other, rest)
    let_cols = {}
    for var, src in spec["let"].items():
        if not (isinstance(src, str) and src.startswith("$")):
            raise MongoTranslateError(
                f"let value for {var!r} must be a '$field' reference"
            )
        let_cols[var] = df[src[1:]]
    out = spec["as"]
    # pack BEFORE the join: unmatched left rows then carry a NULL struct
    # (matching the localField path), not a struct of NULLs
    packed = other.select(
        F.struct(*[other[c] for c in other.columns]).alias(out)
    )
    cond = _compile_lookup_expr(
        pipeline[0]["$match"]["$expr"], let_cols,
        lambda name: packed[f"{out}.{name}"],
    )
    how = "left" if preserve else "inner"
    return df.join(packed, cond, how)


def _apply_lookup(
    df: DataFrame, spec: dict, unwound: bool, preserve: bool = False
) -> DataFrame:
    """$lookup: left outer equi-join against another collection.

    Mongo semantics put the matches in an ARRAY field (``as``); when the
    pipeline immediately ``$unwind``s that field, the compiler fuses the
    pair into a plain join — no collect_list/explode round-trip, which is
    the difference between one shuffle and two at scale. The fused join is
    inner for Mongo's default unwind (rows with empty match arrays
    disappear) and left outer when ``preserveNullAndEmptyArrays`` is true
    (unmatched rows survive with a NULL struct — same shape explode_outer
    yields over an empty match array).
    """
    if "let" in spec:
        return _apply_correlated_lookup(df, spec, unwound, preserve)
    for k in ("from", "localField", "foreignField", "as"):
        if k not in spec:
            raise MongoTranslateError(f"$lookup requires {k!r}")
    unknown = set(spec) - {"from", "localField", "foreignField", "as", "pipeline"}
    if unknown:
        raise MongoTranslateError(
            f"unsupported $lookup options {sorted(unknown)!r}"
        )
    other: DataFrame = spec["from"]
    if not isinstance(other, DataFrame):
        raise MongoTranslateError("$lookup 'from' must be a DataFrame collection")
    if spec.get("pipeline"):
        # uncorrelated sub-pipeline: pre-filter/shape the joined collection
        # (with localField/foreignField this is Mongo's "filtered lookup"
        # idiom); compiles to stages on the build side BEFORE the join, so
        # a $match here shrinks the shuffle/broadcast, not the output
        other = mongo_pipeline(other, spec["pipeline"])
    local, foreign, out = spec["localField"], spec["foreignField"], spec["as"]
    if foreign not in other.columns:
        raise MongoTranslateError(
            f"$lookup foreignField {foreign!r} missing after pipeline"
        )
    rcols = [c for c in other.columns if c != foreign]
    if unwound:
        right = other.select(
            F.col(foreign).alias("__fk"),
            F.struct(*[F.col(c) for c in rcols]).alias(out),
        )
        how = "left" if preserve else "inner"
        return df.join(right, F.col(local) == F.col("__fk"), how).drop("__fk")
    right = (
        other.groupBy(F.col(foreign).alias("__fk"))
        .agg(F.collect_list(F.struct(*[F.col(c) for c in rcols])).alias(out))
    )
    joined = df.join(right, F.col(local) == F.col("__fk"), "left").drop("__fk")
    # Mongo yields [] (not null) when nothing matched
    return joined.withColumn(
        out, F.coalesce(F.col(out), F.array().cast(joined.schema[out].dataType))
    )


#: stage -> the spec key that names another collection
_COLLECTION_KEYS = {"$lookup": "from", "$graphLookup": "from", "$unionWith": "coll"}


def _resolve_collections(node, collections: dict[str, DataFrame]):
    """Replace collection-NAME references with their DataFrames, the way a
    real Mongo pipeline written against named collections arrives: the
    ``from`` of $lookup/$graphLookup and the ``coll`` of $unionWith may be
    strings when a catalog is provided. Resolution is scoped to exactly
    those stage specs (a user FIELD named "from" elsewhere is untouched);
    nested pipelines ($facet, $lookup sub-pipelines) are walked too. An
    unknown name raises with the catalog's keys."""
    if isinstance(node, dict):
        out = {}
        for k, v in node.items():
            ck = _COLLECTION_KEYS.get(k)
            if k == "$unionWith" and isinstance(v, str):
                # Mongo's bare shorthand: {"$unionWith": "collection"}
                if v not in collections:
                    raise MongoTranslateError(
                        f"unknown collection {v!r}; catalog has "
                        f"{sorted(collections)}"
                    )
                out[k] = collections[v]
                continue
            if ck and isinstance(v, dict) and isinstance(v.get(ck), str):
                name = v[ck]
                if name not in collections:
                    raise MongoTranslateError(
                        f"unknown collection {name!r}; catalog has "
                        f"{sorted(collections)}"
                    )
                v = {**v, ck: collections[name]}
            out[k] = _resolve_collections(v, collections)
        return out
    if isinstance(node, list):
        return [_resolve_collections(v, collections) for v in node]
    return node


def mongo_pipeline(
    df: DataFrame,
    pipeline: list[dict],
    collections: dict[str, DataFrame] | None = None,
) -> DataFrame:
    """Compile a Mongo aggregation pipeline against ``df`` (one collection).

    Returns a lazy DataFrame — stages become Catalyst operators, so a
    $match after $project still pushes to the scan, $sort+$limit plans
    top-k, and a $group on a pre-partitioned key avoids a second shuffle.
    ``$lookup`` immediately followed by ``$unwind`` of the looked-up field
    is fused into a single join.

    ``collections`` is an optional name -> DataFrame catalog letting
    $lookup/$unionWith/$graphLookup reference other collections BY NAME,
    exactly as pipelines are written against a real database.
    """
    pipeline = list(pipeline)
    if collections is not None:
        pipeline = _resolve_collections(pipeline, collections)
    i = 0
    prev_op = None
    while i < len(pipeline):
        stage = pipeline[i]
        if not (isinstance(stage, dict) and len(stage) == 1):
            raise MongoTranslateError(f"stage must be a one-key dict: {stage}")
        (op, spec), = stage.items()
        if op == "$lookup":
            nxt = pipeline[i + 1] if i + 1 < len(pipeline) else None
            unwind_field, preserve, unwind_idx = None, False, None
            if isinstance(nxt, dict) and "$unwind" in nxt:
                unwind_field, preserve, unwind_idx = _unwind_spec(nxt["$unwind"])
            # an index request needs the real array positions -> no fusion
            fused = unwind_field == spec.get("as") and unwind_idx is None
            df = _apply_lookup(df, spec, unwound=fused, preserve=preserve)
            prev_op = "$lookup"
            i += 2 if fused else 1
            continue
        if op in ("$out", "$merge"):
            if i != len(pipeline) - 1:
                raise MongoTranslateError(f"{op} must be the final stage")
            df = _apply_out(df, spec) if op == "$out" else _apply_merge(df, spec)
            prev_op = op
            i += 1
            continue
        if op == "$skip":
            # deterministic only over an ordered stream: require $sort
            # immediately before (Mongo's .sort().skip().limit() idiom)
            if prev_op != "$sort":
                raise MongoTranslateError(
                    "$skip is only supported directly after $sort (an "
                    "unordered skip returns arbitrary rows)"
                )
            df = df.offset(int(spec))
        else:
            df = _apply_stage(df, op, spec)
        prev_op = op
        i += 1
    return df


#: window ops that need sortBy and take no window spec
_RANK_OPS = {
    "$rank": F.rank,
    "$denseRank": F.dense_rank,
    "$documentNumber": F.row_number,
}

#: accumulators usable over a documents window
_WINDOW_ACCUM = {
    "$sum", "$avg", "$min", "$max", "$count", "$first", "$last",
    "$push", "$stdDevPop", "$stdDevSamp",
}


def _window_bound(b: Any, side: str) -> int:
    from pyspark.sql import Window as W

    if b == "unbounded":
        return W.unboundedPreceding if side == "lo" else W.unboundedFollowing
    if b == "current":
        return W.currentRow
    if isinstance(b, int) and not isinstance(b, bool):
        return b
    raise MongoTranslateError(f"unsupported window bound {b!r}")


def _apply_set_window_fields(df: DataFrame, spec: dict) -> DataFrame:
    """``$setWindowFields`` -> Spark window functions.

    partitionBy: '$field' (or list of them) / omitted = whole collection.
    sortBy: {field: 1|-1}. output: rank ops ($rank/$denseRank/
    $documentNumber), $shift {output, by, default}, or an accumulator with
    an optional ``window: {documents: [lo, hi]}`` (Mongo's default window
    is unbounded..unbounded; ``range`` windows are unsupported and raise).
    """
    from pyspark.sql import Window as W

    unknown = set(spec) - {"partitionBy", "sortBy", "output"}
    if unknown:
        raise MongoTranslateError(
            f"unsupported $setWindowFields options {sorted(unknown)!r}"
        )
    if "output" not in spec or not isinstance(spec["output"], dict):
        raise MongoTranslateError("$setWindowFields requires an output dict")

    parts = spec.get("partitionBy")
    if parts is None:
        part_cols = []
    else:
        parts = parts if isinstance(parts, list) else [parts]
        part_cols = []
        for p in parts:
            if not (isinstance(p, str) and p.startswith("$")):
                raise MongoTranslateError(
                    f"partitionBy supports '$field' refs only, got {p!r}"
                )
            part_cols.append(F.col(p[1:]))
    sort_cols = [
        F.col(k).asc() if v == 1 else F.col(k).desc()
        for k, v in (spec.get("sortBy") or {}).items()
    ]
    base = W.partitionBy(*part_cols)
    ordered = base.orderBy(*sort_cols) if sort_cols else base

    out_cols: dict[str, Column] = {}
    for name, ospec in spec["output"].items():
        if not (isinstance(ospec, dict) and ospec):
            raise MongoTranslateError(f"output {name!r} must be an op dict")
        wspec = ospec.get("window")
        ops = {k: v for k, v in ospec.items() if k != "window"}
        if len(ops) != 1:
            raise MongoTranslateError(f"output {name!r} must have one operator")
        (wop, arg), = ops.items()
        if wop in _RANK_OPS:
            if not sort_cols:
                raise MongoTranslateError(f"{wop} requires sortBy")
            if wspec is not None:
                raise MongoTranslateError(f"{wop} takes no window spec")
            out_cols[name] = _RANK_OPS[wop]().over(ordered)
            continue
        if wop == "$shift":
            if not sort_cols:
                raise MongoTranslateError("$shift requires sortBy")
            if not (isinstance(arg, dict) and "output" in arg and "by" in arg):
                raise MongoTranslateError("$shift requires {output, by}")
            by = int(arg["by"])
            default = F.lit(arg.get("default"))
            col = expr(arg["output"])
            out_cols[name] = (
                F.lead(col, by, None).over(ordered)
                if by >= 0
                else F.lag(col, -by, None).over(ordered)
            )
            out_cols[name] = F.coalesce(out_cols[name], default)
            continue
        if wop not in _WINDOW_ACCUM:
            raise MongoTranslateError(f"unsupported window operator {wop!r}")
        if wspec is not None:
            unknown_w = set(wspec) - {"documents"}
            if unknown_w:
                raise MongoTranslateError(
                    f"unsupported window spec {sorted(unknown_w)!r} "
                    "(range windows not supported)"
                )
            lo, hi = wspec["documents"]
            frame = ordered.rowsBetween(
                _window_bound(lo, "lo"), _window_bound(hi, "hi")
            )
        elif sort_cols:
            # Mongo default: unbounded..unbounded even when sorted
            frame = ordered.rowsBetween(
                W.unboundedPreceding, W.unboundedFollowing
            )
        else:
            frame = base
        if wop == "$count":
            acc = F.count(F.lit(1))
        elif wop == "$sum" and not isinstance(arg, (str, dict)):
            # {"$sum": 1} -> running count
            acc = F.count(F.lit(1)) if arg == 1 else F.count(F.lit(1)) * F.lit(arg)
        else:
            acc = _ACCUM[wop](expr(arg))
        out_cols[name] = acc.over(frame)
    return df.withColumns(out_cols)


#: BFS round cap when $graphLookup has no maxDepth (loud, not silent).
_GRAPH_LOOKUP_MAX_ROUNDS = 25


def _apply_graph_lookup(df: DataFrame, spec: dict) -> DataFrame:
    """``$graphLookup``: BFS from ``startWith`` through the ``from``
    collection (edge: previous doc's ``connectFromField`` value -> next
    doc's ``connectToField``), collecting every reached doc into ``as``
    (+ optional ``depthField``).

    Compiled as iterative equi-joins — one join per BFS level, frontier
    and visited-set checkpointed per round (same discipline as
    operators/dedup.connected_components; each level is a key-partitioned
    join, never a recursive re-scan per document). Cycles terminate
    because visited (doc, origin) pairs are never re-expanded. Both the
    input docs and the ``from`` collection must carry a unique ``_id``
    (Mongo documents always do). Without ``maxDepth`` the loop runs to
    fixpoint and RAISES past ``_GRAPH_LOOKUP_MAX_ROUNDS`` rounds rather
    than silently truncating. The ``as`` array is sorted by
    (depth, _id) for deterministic output.
    """
    required = {"from", "startWith", "connectFromField", "connectToField", "as"}
    unknown = set(spec) - required - {"maxDepth", "depthField"}
    if unknown:
        raise MongoTranslateError(
            f"unsupported $graphLookup options {sorted(unknown)!r}"
        )
    for k in required:
        if k not in spec:
            raise MongoTranslateError(f"$graphLookup requires {k!r}")
    other = spec["from"]
    if not isinstance(other, DataFrame):
        raise MongoTranslateError("$graphLookup 'from' must be a DataFrame")
    if "_id" not in df.columns or "_id" not in other.columns:
        raise MongoTranslateError(
            "$graphLookup needs '_id' on both the input docs and 'from'"
        )
    start = spec["startWith"]
    if not (isinstance(start, str) and start.startswith("$")):
        raise MongoTranslateError("startWith supports '$field' refs only")
    cfrom, cto, out = spec["connectFromField"], spec["connectToField"], spec["as"]
    depth_field = spec.get("depthField")
    max_depth = spec.get("maxDepth")

    doc = F.struct(*[F.col(c) for c in other.columns]).alias("__doc")
    nodes = other.select(
        F.col(cto).alias("__to"),
        F.col(cfrom).alias("__from"),
        F.col("_id").alias("__nid"),
        doc,
    )

    frontier = df.select(
        F.col("_id").alias("__origin"), F.col(start[1:]).alias("__v")
    ).dropDuplicates()
    visited = None  # rows: (__origin, __nid, __doc, __depth)
    depth = 0
    while True:
        if max_depth is not None and depth > int(max_depth):
            break
        if max_depth is None and depth >= _GRAPH_LOOKUP_MAX_ROUNDS:
            raise MongoTranslateError(
                f"$graphLookup did not converge in {_GRAPH_LOOKUP_MAX_ROUNDS}"
                " rounds; pass maxDepth to bound the traversal"
            )
        matched = frontier.join(
            nodes, frontier["__v"] == nodes["__to"], "inner"
        ).select("__origin", "__nid", "__doc", "__from")
        if visited is not None:
            matched = matched.join(
                visited.select("__origin", "__nid"),
                on=["__origin", "__nid"],
                how="left_anti",
            )
        matched = matched.localCheckpoint(eager=True)
        if matched.isEmpty():
            break
        level = matched.select(
            "__origin", "__nid", "__doc", F.lit(depth).alias("__depth")
        )
        visited = level if visited is None else visited.unionByName(level)
        frontier = matched.select(
            F.col("__origin"), F.col("__from").alias("__v")
        ).dropDuplicates()
        depth += 1

    from pyspark.sql.types import ArrayType, LongType, StructField, StructType

    doc_type = other.select(doc).schema["__doc"].dataType
    elem_fields = list(doc_type.fields)
    if depth_field is not None:
        elem_fields = elem_fields + [StructField(depth_field, LongType())]
    out_type = ArrayType(StructType(elem_fields))

    if visited is None:  # nothing reachable for any doc: typed empty arrays
        return df.withColumn(out, F.array().cast(out_type))

    elem = F.struct(F.col("__depth"), F.col("__nid"), F.col("__doc"))
    collected = visited.groupBy("__origin").agg(
        F.array_sort(F.collect_list(elem)).alias("__arr")
    )
    joined = df.join(
        collected, df["_id"] == collected["__origin"], "left"
    ).drop("__origin")
    if depth_field is not None:
        mk = lambda s: s["__doc"].withField(  # noqa: E731
            depth_field, s["__depth"].cast("bigint")
        )
    else:
        mk = lambda s: s["__doc"]  # noqa: E731
    arr = F.transform(F.col("__arr"), mk)
    return joined.withColumn(
        out, F.coalesce(arr, F.array().cast(out_type))
    ).drop("__arr")


#: $densify range units -> seconds (calendar units would need date math
#: beyond a fixed step; they raise).
_DENSIFY_UNITS = {"second": 1, "minute": 60, "hour": 3600, "day": 86400}


def _apply_densify(df: DataFrame, spec: dict) -> DataFrame:
    """``$densify`` -> operators/fill.densify: per-partition tick scaffold
    over each partition's own [min, max] span (Mongo's
    ``bounds: "partition"``; ``"full"``/explicit bounds unsupported)."""
    from .fill import densify

    unknown = set(spec) - {"field", "range", "partitionByFields"}
    if unknown:
        raise MongoTranslateError(f"unsupported $densify options {sorted(unknown)!r}")
    if "field" not in spec or "range" not in spec:
        raise MongoTranslateError("$densify requires field and range")
    rng = spec["range"]
    if rng.get("bounds", "partition") != "partition":
        raise MongoTranslateError("$densify supports bounds: 'partition' only")
    unit = rng.get("unit")
    if unit not in _DENSIFY_UNITS:
        raise MongoTranslateError(f"unsupported $densify unit {unit!r}")
    step = int(rng["step"]) * _DENSIFY_UNITS[unit]
    return densify(
        df,
        ts=spec["field"],
        step_seconds=step,
        keys=spec.get("partitionByFields", []),
    )


def _apply_fill(df: DataFrame, spec: dict) -> DataFrame:
    """``$fill`` -> operators/fill.fill_series (methods locf/linear) or a
    constant ``value`` fill. sortBy must be a single ascending field."""
    from .fill import fill_series

    unknown = set(spec) - {"sortBy", "partitionBy", "partitionByFields", "output"}
    if unknown:
        raise MongoTranslateError(f"unsupported $fill options {sorted(unknown)!r}")
    if not isinstance(spec.get("output"), dict) or not spec["output"]:
        raise MongoTranslateError("$fill requires an output dict")
    keys = spec.get("partitionByFields")
    if keys is None:
        pb = spec.get("partitionBy")
        if pb is not None and not (isinstance(pb, str) and pb.startswith("$")):
            raise MongoTranslateError("partitionBy supports a '$field' ref only")
        keys = [pb[1:]] if pb else []
    sort = spec.get("sortBy") or {}
    by_method: dict[str, list[str]] = {}
    out = df
    for field, fspec in spec["output"].items():
        if not (isinstance(fspec, dict) and len(fspec) == 1):
            raise MongoTranslateError(f"$fill output {field!r} must be one-key")
        (kind, arg), = fspec.items()
        if kind == "value":
            out = out.withColumn(field, F.coalesce(F.col(field), expr(arg)))
        elif kind == "method" and arg in ("locf", "linear"):
            by_method.setdefault(arg, []).append(field)
        else:
            raise MongoTranslateError(f"unsupported $fill spec {fspec!r}")
    if by_method:
        if len(sort) != 1 or list(sort.values()) != [1]:
            raise MongoTranslateError(
                "$fill with method needs sortBy of one ascending field"
            )
        ts = next(iter(sort))
        for method, fields in by_method.items():
            out = fill_series(out, ts=ts, values=fields, keys=keys, method=method)
    return out


def _apply_stage(df: DataFrame, op: str, spec: Any) -> DataFrame:
    if op == "$match":
        return df.filter(match_filter(spec))
    if op == "$setWindowFields":
        return _apply_set_window_fields(df, spec)
    if op == "$graphLookup":
        return _apply_graph_lookup(df, spec)
    if op == "$densify":
        return _apply_densify(df, spec)
    if op == "$fill":
        return _apply_fill(df, spec)
    if op == "$project":
        includes = [k for k, v in spec.items() if v not in (0, False)]
        excludes = [k for k, v in spec.items() if v in (0, False)]
        if includes and excludes:
            raise MongoTranslateError("$project cannot mix include and exclude")
        if excludes:
            return df.drop(*excludes)
        cols = []
        for k, v in spec.items():
            if v in (1, True):
                cols.append(F.col(k))
            else:
                cols.append(expr(v).alias(k))
        return df.select(*cols)
    if op in ("$addFields", "$set"):
        return df.withColumns({k: expr(v) for k, v in spec.items()})
    if op == "$group":
        return _apply_group(df, spec)
    if op == "$sort":
        return df.orderBy(
            *[F.col(k).asc() if v == 1 else F.col(k).desc() for k, v in spec.items()]
        )
    if op == "$limit":
        return df.limit(int(spec))
    if op == "$unwind":
        field, preserve, idx = _unwind_spec(spec)
        if idx is None:
            exploder = F.explode_outer if preserve else F.explode
            return df.withColumn(field, exploder(F.col(field)))
        # includeArrayIndex -> posexplode; Mongo's index is a long, null
        # for the preserved null/empty rows
        pos_exploder = F.posexplode_outer if preserve else F.posexplode
        others = [c for c in df.columns if c != field]
        return (
            df.select(*others, pos_exploder(F.col(field)).alias("__pos", field))
            .withColumn(idx, F.col("__pos").cast("long"))
            .drop("__pos")
        )
    if op == "$unionWith":
        # {"$unionWith": {"coll": df, "pipeline": [...]}} or a bare DataFrame.
        # Mongo appends the other collection's (piped) docs; missing fields
        # become null -> unionByName(allowMissingColumns=True).
        if isinstance(spec, DataFrame):
            other = spec
        elif isinstance(spec, dict):
            unknown = set(spec) - {"coll", "pipeline"}
            if unknown:
                raise MongoTranslateError(
                    f"unsupported $unionWith options {sorted(unknown)!r}"
                )
            other = spec.get("coll")
            if not isinstance(other, DataFrame):
                raise MongoTranslateError(
                    "$unionWith 'coll' must be a DataFrame collection"
                )
            if spec.get("pipeline"):
                other = mongo_pipeline(other, spec["pipeline"])
        else:
            raise MongoTranslateError(f"unsupported $unionWith spec {spec!r}")
        return df.unionByName(other, allowMissingColumns=True)
    if op == "$count":
        return df.agg(F.count(F.lit(1)).alias(str(spec)))
    if op == "$facet":
        return _apply_facet(df, spec)
    if op == "$sortByCount":
        # Mongo: group by the expression, count, sort count desc. Ties are
        # arbitrary in Mongo; we break them by _id asc so the result is
        # deterministic (and hash-stable) across engines.
        key = expr(spec).alias("_id")
        return (
            df.groupBy(key)
            .agg(F.count(F.lit(1)).alias("count"))
            .orderBy(F.desc("count"), F.asc("_id"))
        )
    if op == "$bucket":
        return _apply_bucket(df, spec)
    if op == "$bucketAuto":
        return _apply_bucket_auto(df, spec)
    if op in ("$replaceRoot", "$replaceWith"):
        # {"$replaceRoot": {"newRoot": "$struct_field"}} / {"$replaceWith": "$f"}
        root = spec.get("newRoot") if isinstance(spec, dict) else spec
        if not (isinstance(root, str) and root.startswith("$")):
            raise MongoTranslateError(
                f"{op} requires a '$field' newRoot (struct promotion): {spec!r}"
            )
        return df.select(F.col(root[1:] + ".*"))
    raise MongoTranslateError(f"unsupported stage {op!r}")


def _apply_bucket(df: DataFrame, spec: dict) -> DataFrame:
    """$bucket: assign each doc to [b[i], b[i+1]) by ``groupBy`` value;
    ``_id`` is the bucket's lower boundary, out-of-range docs go to
    ``default`` (raise without one — Mongo errors there too). Compiles to
    one CASE WHEN chain + one grouped agg; boundaries are literals, so the
    chain is codegen'd and the only shuffle is the group itself."""
    for k in ("groupBy", "boundaries"):
        if k not in spec:
            raise MongoTranslateError(f"$bucket requires {k!r}")
    unknown = set(spec) - {"groupBy", "boundaries", "default", "output"}
    if unknown:
        raise MongoTranslateError(f"unsupported $bucket options {sorted(unknown)!r}")
    bounds = spec["boundaries"]
    if len(bounds) < 2 or sorted(bounds) != list(bounds):
        raise MongoTranslateError("$bucket boundaries must be sorted, len >= 2")
    val = expr(spec["groupBy"])
    bucket = None
    for lo, hi in zip(bounds, bounds[1:]):
        cond = (val >= F.lit(lo)) & (val < F.lit(hi))
        bucket = F.when(cond, F.lit(lo)) if bucket is None else bucket.when(cond, F.lit(lo))
    if "default" in spec:
        bucket = bucket.otherwise(F.lit(spec["default"]))
    # without a default, out-of-range rows fall out (Mongo raises per-doc;
    # a distributed engine can't raise per-row cheaply — filter instead)
    out = df.withColumn("__bucket", bucket)
    if "default" not in spec:
        out = out.filter(F.col("__bucket").isNotNull())
    aggs = (
        [_accumulator(k, v) for k, v in spec["output"].items()]
        if spec.get("output")
        else [F.count(F.lit(1)).alias("count")]
    )
    return out.groupBy(F.col("__bucket").alias("_id")).agg(*aggs)


def _apply_out(df: DataFrame, spec: Any) -> DataFrame:
    """$out: replace the target collection with the pipeline result.

    Collections here are storage paths: ``{"path": ..., "format":
    "parquet"|"jsonl"}``. Unlike Mongo (whose $out yields an empty
    cursor), this returns the result READ BACK from the sink — the
    round-trip is the natural verification hook and keeps the stage
    composable in tests."""
    if not (isinstance(spec, dict) and "path" in spec):
        raise MongoTranslateError(f"$out spec must be a dict with 'path': {spec!r}")
    unknown = set(spec) - {"path", "format"}
    if unknown:
        raise MongoTranslateError(f"unsupported $out options {sorted(unknown)!r}")
    fmt = spec.get("format", "parquet")
    path = spec["path"]
    spark = df.sparkSession
    if fmt == "parquet":
        df.write.mode("overwrite").parquet(path)
        return spark.read.parquet(path)
    if fmt == "jsonl":
        df.write.mode("overwrite").json(path)
        return spark.read.schema(df.schema).json(path)
    raise MongoTranslateError(f"unsupported $out format {fmt!r}")


def _apply_merge(df: DataFrame, spec: dict) -> DataFrame:
    """$merge: key-based upsert into a parquet target.

    Supported: ``on`` (single key), ``whenMatched`` in
    {"replace", "keepExisting"}, ``whenNotMatched`` in {"insert",
    "discard"}. Compiled to anti/semi joins + a rewrite: this is the
    filesystem fallback (write temp, swap) — on a real deployment point
    the target at a transactional table format instead; the join logic is
    identical. Missing target = plain write (everything is an insert)."""
    import os
    import shutil

    for k in ("into", "on"):
        if k not in spec:
            raise MongoTranslateError(f"$merge requires {k!r}")
    unknown = set(spec) - {"into", "on", "whenMatched", "whenNotMatched"}
    if unknown:
        raise MongoTranslateError(f"unsupported $merge options {sorted(unknown)!r}")
    into = spec["into"]
    if not (isinstance(into, dict) and into.get("format", "parquet") == "parquet"):
        raise MongoTranslateError("$merge target must be {'path': ..., 'format': 'parquet'}")
    path, key = into["path"], spec["on"]
    when_matched = spec.get("whenMatched", "replace")
    when_not = spec.get("whenNotMatched", "insert")
    if when_matched not in ("replace", "keepExisting"):
        raise MongoTranslateError(f"unsupported whenMatched {when_matched!r}")
    if when_not not in ("insert", "discard"):
        raise MongoTranslateError(f"unsupported whenNotMatched {when_not!r}")
    spark = df.sparkSession
    if not os.path.exists(path):
        df.write.parquet(path)
        return spark.read.parquet(path)
    existing = spark.read.parquet(path)
    if when_matched == "replace":
        kept_existing = existing.join(df, [key], "left_anti")
        new_rows = df if when_not == "insert" else df.join(existing, [key], "left_semi")
    else:  # keepExisting
        kept_existing = existing
        new_rows = (
            df.join(existing, [key], "left_anti")
            if when_not == "insert"
            else df.limit(0)
        )
    result = kept_existing.unionByName(new_rows)
    tmp = path.rstrip("/") + "__merge_tmp"
    result.write.mode("overwrite").parquet(tmp)
    shutil.rmtree(path)
    os.rename(tmp, path)
    return spark.read.parquet(path)


def _apply_bucket_auto(df: DataFrame, spec: dict) -> DataFrame:
    """$bucketAuto: ~equal-count quantile buckets. Mongo only "attempts"
    even distribution; we define it deterministically as
    ``bucket = min(floor(percent_rank * N), N-1)`` — rank-based, so TIED
    groupBy values always land in the same bucket (never split), which
    keeps the result stable across engines and partitionings. ``_id`` is
    flattened to ``_id_min``/``_id_max`` bounds (portable columns instead
    of a struct).

    Scale note: the input is document-grain (the largest thing in the
    pipeline), so the rank runs through
    :func:`operators.ranking.distributed_percent_rank` — range-partition
    + per-partition offsets, bit-identical to the native
    ``percent_rank`` window but with no single-partition task.
    ``granularity`` is unsupported and raises.

    Execution note (r5 advisory): ``distributed_percent_rank`` is EAGER —
    translating a $bucketAuto stage runs a localCheckpoint plus a bounded
    P-row collect at plan-BUILD time (the per-partition rank offsets are
    data-dependent), so this stage is not lazily recomposable like the
    rest of the pipeline frontend. The localCheckpoint blocks are
    unreplicated executor state: on a fault-sensitive deployment, losing
    an executor mid-query makes the ranged frame unrecoverable (job
    retry re-translates from the source instead of recomputing lineage).
    Accepted trade: recompute-on-retry, in exchange for no
    single-partition window at any scale.
    """
    from .ranking import distributed_percent_rank

    for k in ("groupBy", "buckets"):
        if k not in spec:
            raise MongoTranslateError(f"$bucketAuto requires {k!r}")
    unknown = set(spec) - {"groupBy", "buckets", "output"}
    if unknown:
        raise MongoTranslateError(
            f"unsupported $bucketAuto options {sorted(unknown)!r}"
        )
    n = int(spec["buckets"])
    if n < 1:
        raise MongoTranslateError("$bucketAuto buckets must be >= 1")
    val = expr(spec["groupBy"])
    ranked = distributed_percent_rank(
        df.withColumn("__val", val), "__val", "__pr"
    )
    bucket = F.least(F.floor(F.col("__pr") * n), F.lit(n - 1)).cast("bigint")
    staged = ranked.withColumn("__bucket", bucket).drop("__pr")
    aggs = (
        [_accumulator(k, v) for k, v in spec["output"].items()]
        if spec.get("output")
        else [F.count(F.lit(1)).alias("count")]
    )
    return (
        staged.groupBy("__bucket")
        .agg(F.min("__val").alias("_id_min"), F.max("__val").alias("_id_max"), *aggs)
        .drop("__bucket")
    )


def _apply_facet(df: DataFrame, spec: dict) -> DataFrame:
    """$facet: run each named sub-pipeline over the same input; output is
    ONE document whose fields are arrays of each facet's result docs.

    Each facet compiles through :func:`mongo_pipeline` (so the input scan
    is shared by Catalyst across facets where possible), collapses to a
    single array-of-structs row, and the single-row frames cross-join —
    a cheap plan because every side is exactly one row. Facet arrays only
    have a defined order if the sub-pipeline ends with $sort (same caveat
    as Mongo); the coalesce(1) before collect_list preserves that order.
    """
    if not (isinstance(spec, dict) and spec):
        raise MongoTranslateError("$facet requires a non-empty dict of pipelines")
    import functools

    ones = []
    for name, stages in spec.items():
        if not isinstance(stages, list):
            raise MongoTranslateError(f"$facet field {name!r} must be a pipeline")
        sub = mongo_pipeline(df, stages)
        ones.append(
            sub.coalesce(1).agg(
                F.collect_list(
                    F.struct(*[F.col(c) for c in sub.columns])
                ).alias(name)
            )
        )
    return functools.reduce(lambda a, b: a.crossJoin(b), ones)
