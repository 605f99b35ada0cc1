"""Plan doctor: automated scale-smell diagnostics for any DataFrame plan.

Generalizes the per-query assertions in tests/test_plans.py into a
reusable lint a user can run on THEIR queries before submitting them to a
1000-executor cluster. Each rule reads the physical (or analyzed) plan
string and emits findings; an empty report is the goal state.

Rules (severity):
- ``cartesian_join`` (error): CartesianProduct / BroadcastNestedLoopJoin —
  row-count products; almost always a missing equi-condition.
- ``python_row_boundary`` (error): BatchEvalPython — row-at-a-time Python
  UDF in the plan; rewrite as column expressions or an Arrow-batched UDF.
- ``global_window`` (warn): a window function with an EMPTY partition
  spec moves every row to ONE partition — fine on post-aggregate
  hundreds of rows, fatal on a raw fact table.
- ``global_sort`` (warn): a global Sort node (``Sort [...], true``) that
  is not a TakeOrderedAndProject — top-k should use orderBy+limit. A bare
  rangepartitioning exchange (repartitionByRange) is NOT flagged: range
  clustering without a total sort is the scale-correct distributed-ranking
  and write-layout pattern.
- ``unpushed_filter`` (warn): a Filter sits on a Parquet scan whose
  PushedFilters list is empty — the predicate streams every row group.
- ``lazy_rescan`` (error): the same NOT-YET-MATERIALIZED checkpoint RDD
  is scanned more than once in a plan that also contains broadcast
  exchanges or subqueries — the r11 race class: broadcast/subquery jobs
  launch CONCURRENTLY with the main stages, and concurrent first
  consumers of a lazy ``localCheckpoint`` each recompute its lineage
  (the corpus stage silently runs 2-3x per action; found three times in
  r11 — MG partials, LM tokenize, DSIR count models). Fix: eager
  checkpoint the BOUNDED derived frame (never a corpus-scaled one).
- ``hof_reeval`` (error): a tokenizer-class expression (split / regexp
  over a string column) inside a higher-order-function lambda body that
  references NO in-scope lambda variable — loop-invariant non-cheap work
  that re-evaluates once per array element because codegen's
  subexpression elimination does not reach into ``LambdaFunction``
  bodies (the r12 lm.py finding: 6x CPU on the bigram count stage).
  Fix: project the expression as a real column before the HOF.
- ``wide_scan`` (info): a Parquet scan reading 12+ columns — verify the
  query really needs them (projection pruning may be blocked by
  ``select *`` or UDF opacity).

The doctor reports; it does not veto. Severities are advisory because
every rule has legitimate exceptions (deliberate broadcast cross products
against parameter-bounded sides, post-agg global windows) — the point is
that the exception should be a *decision*, not an accident.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

from .inspect import explain_str


#: Registry-wide declared exceptions: query name -> {rule: justification}.
#: Every entry is a deliberate bounded-side pattern, not an accident —
#: the doctor still reports these as 'allowed' so the decision stays
#: visible in PLANS.md and the CLI.
QUERY_ALLOWS: dict[str, dict[str, str]] = {
    "ann_pq_topk": {
        "cartesian_join": (
            "ADC scores every corpus row against every query by "
            "definition; the query side is the broadcast |Q|-row table"
        )
    },
    "ann_bruteforce_topk": {
        "cartesian_join": (
            "exact baseline is |Q| x corpus by definition; query side "
            "broadcast, |Q| parameter-bounded"
        )
    },
    "ann_ivf_topk": {
        "cartesian_join": (
            "centroid assignment probes all K cells per vector; the "
            "centroid side is K parameter-bounded broadcast rows"
        )
    },
    "semantic_dedup_survivors": {
        "cartesian_join": (
            "same K-bounded centroid-assignment broadcast as ann_ivf_topk "
            "(the small-K crossJoin path; K>64 switches to the Arrow "
            "candidate pass with an equi join). Pre-r7 the pair stage's "
            "localCheckpoint barrier hid this node from the doctor; "
            "removing the checkpoint exposed, not introduced, it"
        )
    },
    "monthly_revenue_running": {
        "global_window": (
            "running window over the ~83-row post-aggregation monthly "
            "series — single-partition is the correct plan at any SF"
        )
    },
    "revenue_moving_avg": {
        "global_window": "3-row frame over the ~83-row monthly aggregate"
    },
    "revenue_trailing_7d": {
        "global_window": (
            "time-RANGE frame over the post-aggregation DAILY series "
            "(~2.5k rows at any SF — bounded by calendar, not data)"
        )
    },
    "revenue_rolling_median": {
        "global_window": "7-day frame over the bounded daily aggregate"
    },
    "lineitem_profile": {
        "cartesian_join": (
            "five 1-row distinct-count aggregates broadcast-joined into "
            "the single profile row (the Expand-free profiling plan)"
        )
    },
    "mongo_priority_sort_by_count": {
        "global_sort": (
            "$sortByCount's contract IS the fully sorted group-count "
            "collection (group-count-bounded; no limit to push)"
        )
    },
    "doc_lm_perplexity": {
        "cartesian_join": "1-row vocabulary-size table joined to every bigram"
    },
    "token_heavy_hitters": {
        "global_window": (
            "merge-correction/stream-total windows over the combined "
            "sketch frame (<= n_partitions*(k+1) rows by construction — "
            "the r11 single-plan shape that removed the broadcast-"
            "subquery partials race)"
        )
    },
    "theta_customer_overlap": {
        "cartesian_join": "1-row sketch tables combined into the report row"
    },
    "hll_mergeable_rollup": {
        "cartesian_join": (
            "1-row union-estimate x 1-row exact-total tables combined "
            "into the certified total row"
        )
    },
    "kll_mergeable_quantiles": {
        "cartesian_join": "1-row merged-sketch x 1-row global-exact tables"
    },
    "dsir_importance_weights": {
        "cartesian_join": "1-row n-gram grand-total tables joined to every gram"
    },
    "dsir_selected_docs": {
        "cartesian_join": "1-row n-gram grand-total tables joined to every gram"
    },
    "star_fk_integrity": {
        "cartesian_join": "two 1-row audit aggregates combined per FK edge"
    },
    "price_tier_totals": {
        "cartesian_join": (
            "banded range join against the broadcast tier table "
            "(fixed tier count)"
        )
    },
}


#: Expression classes whose per-row cost is tokenizer-class (regex/split
#: over a string column) — non-cheap enough that re-evaluating one per
#: ARRAY ELEMENT inside a higher-order-function lambda is the r12 lm bug
#: class (measured 6x CPU on the bigram count stage).
_HOF_EXPENSIVE = {
    "StringSplit",
    "RegExpExtract",
    "RegExpExtractAll",
    "RegExpReplace",
    "Sentences",
}


def _hof_invariant_tokenizers(df: DataFrame) -> list[str]:
    """Tokenizer-class expressions that sit INSIDE a higher-order-function
    lambda body but reference NONE of the in-scope lambda variables —
    i.e. loop-invariant non-cheap work that codegen cannot hoist
    (subexpression elimination does not reach into ``LambdaFunction``
    bodies, so the expression re-runs once per array element).

    The r12 repo-class find, mechanized (r12 verdict item 3): an inlined
    ``T.tokens(text)`` referenced via ``element_at(toks, i)`` inside the
    bigram transform re-ran the split+filter tokenizer per element —
    475s -> 78s CPU at sf10 once projected as a real column. A
    tokenizer applied TO a lambda variable (``transform(toks, t ->
    regexp_replace(t, ...))``) is per-element by construction and is NOT
    flagged. Traverses the OPTIMIZED logical plan so optimizer-inlined
    shapes (CollapseProject folding a single-consumer projection back
    into a lambda) are caught too."""
    hits: list[str] = []

    def subtree_refs_scope(expr, scope: set[int]) -> bool:
        stack = [expr]
        while stack:
            e = stack.pop()
            if (
                e.getClass().getSimpleName() == "NamedLambdaVariable"
                and e.exprId().id() in scope
            ):
                return True
            ch = e.children()
            for i in range(ch.size()):
                stack.append(ch.apply(i))
        return False

    def walk_expr(expr, scope: frozenset[int]) -> None:
        name = expr.getClass().getSimpleName()
        if name == "LambdaFunction":
            args = expr.arguments()
            inner = set(scope)
            for i in range(args.size()):
                inner.add(args.apply(i).exprId().id())
            ch = expr.children()
            for i in range(ch.size()):
                walk_expr(ch.apply(i), frozenset(inner))
            return
        if name in _HOF_EXPENSIVE and scope:
            if not subtree_refs_scope(expr, set(scope)):
                hits.append(name)
                return  # one hit per invariant subtree is enough
        ch = expr.children()
        for i in range(ch.size()):
            walk_expr(ch.apply(i), scope)

    plan_stack = [df._jdf.queryExecution().optimizedPlan()]
    while plan_stack:
        node = plan_stack.pop()
        exprs = node.expressions()
        for i in range(exprs.size()):
            walk_expr(exprs.apply(i), frozenset())
        children = node.children()
        for i in range(children.size()):
            plan_stack.append(children.apply(i))
        subqs = node.subqueries()
        for i in range(subqs.size()):
            plan_stack.append(subqs.apply(i))
    return hits


def _lazy_rescans(df: DataFrame) -> list[tuple[int, int]]:
    """(rdd_id, scan_count) for every checkpoint-backed ``LogicalRDD``
    scanned >= 2 times in the analyzed plan whose RDD has NOT materialized
    yet (``isCheckpointed()`` false — i.e. a lazy ``localCheckpoint``, or
    one whose eager flag was dropped). Traverses the JVM logical plan;
    an eager checkpoint is already materialized when the query builder
    returns, so it reports true and never appears here."""
    counts: dict[int, int] = {}
    lazy: set[int] = set()
    stack = [df._jdf.queryExecution().analyzed()]
    while stack:
        node = stack.pop()
        if node.getClass().getSimpleName() == "LogicalRDD":
            rdd = node.rdd()
            rid = rdd.id()
            counts[rid] = counts.get(rid, 0) + 1
            if not rdd.isCheckpointed():
                lazy.add(rid)
        children = node.children()
        for i in range(children.size()):
            stack.append(children.apply(i))
        # subquery plans hang off expressions, not children
        subqs = node.subqueries()
        for i in range(subqs.size()):
            stack.append(subqs.apply(i))
    return [(rid, c) for rid, c in counts.items() if c >= 2 and rid in lazy]


def diagnose(df: DataFrame, allow: dict[str, str] | None = None) -> list[dict]:
    """Run every rule; return findings as dicts (rule, severity, detail).

    ``allow`` maps rule name -> justification for plans where the smell
    is a deliberate decision (e.g. a broadcast cross product against a
    parameter-bounded side). Allowed findings are downgraded to severity
    ``allowed`` with the justification appended — still visible, no
    longer an error: the exception is documented, not silenced.
    """
    simple = explain_str(df, "simple")
    formatted = explain_str(df, "formatted")
    findings: list[dict] = []

    allowed = allow or {}

    def hit(rule: str, severity: str, detail: str) -> None:
        if rule in allowed:
            severity, detail = "allowed", f"{detail} — {allowed[rule]}"
        findings.append({"rule": rule, "severity": severity, "detail": detail})

    if "CartesianProduct" in simple:
        hit("cartesian_join", "error", "CartesianProduct in physical plan")
    if "BroadcastNestedLoopJoin" in simple:
        hit(
            "cartesian_join",
            "error",
            "BroadcastNestedLoopJoin (non-equi join condition)",
        )
    if "BatchEvalPython" in simple:
        hit(
            "python_row_boundary",
            "error",
            "row-at-a-time Python UDF (BatchEvalPython)",
        )

    # r12 HOF re-evaluation class: a loop-invariant tokenizer inside a
    # higher-order-function lambda body re-runs per array element (codegen
    # subexpression elimination does not reach into lambdas). Fix: project
    # the expensive expression as a real column before the HOF consumes it.
    for cls in _hof_invariant_tokenizers(df):
        hit(
            "hof_reeval",
            "error",
            f"loop-invariant {cls} inside a higher-order-function lambda "
            "body — re-evaluated once per array element (project it as a "
            "real column before the HOF; the r12 lm.py finding, 6x CPU)",
        )

    # r11 race class: multiple scans of an unmaterialized checkpoint RDD
    # in a plan whose broadcast exchanges / subqueries will launch
    # concurrent first consumers — each recomputes the lineage.
    if "BroadcastExchange" in formatted or "Subquery" in formatted:
        for rid, c in _lazy_rescans(df):
            hit(
                "lazy_rescan",
                "error",
                f"unmaterialized checkpoint RDD {rid} scanned {c}x in a "
                "plan with broadcast/subquery consumers — concurrent "
                "first consumers recompute its lineage (use "
                "localCheckpoint(eager=True) on a BOUNDED frame)",
            )

    # Window with empty partition spec: the analyzed plan prints
    # `windowspecdefinition(<part cols>, <order> ASC ...)`; when no
    # partition columns exist the spec STARTS with the ordering expr.
    analyzed = explain_str(df, "extended")
    for spec in re.findall(r"windowspecdefinition\(([^)]*)\)", analyzed):
        head = spec.split(",")[0].strip()
        if " ASC" in head or " DESC" in head or head.startswith("specifiedwindowframe"):
            hit(
                "global_window",
                "warn",
                "window with empty PARTITION BY (single-partition execution)",
            )
            break

    # A GLOBAL Sort node prints `Sort [...], true, 0` (the boolean is the
    # global flag; window/local sorts print false). Detecting the Sort
    # node rather than any `Exchange rangepartitioning` matters: a bare
    # repartitionByRange (distributed ranking, write-layout clustering)
    # range-partitions WITHOUT totally sorting and is the scale-correct
    # pattern, not a smell.
    # Greedy `.*` (not `[^\]]*`): the sort-key list may itself contain
    # brackets (e.g. `arr#5[0] ASC`), and the lazy form stopped at the
    # first `]` and silently missed the trailing `, true` global flag.
    if (
        re.search(r"Sort \[.*\], true", simple)
        and "TakeOrderedAndProject" not in simple
    ):
        hit(
            "global_sort",
            "warn",
            "full global sort (Sort global=true); top-k should be "
            "orderBy+limit (TakeOrderedAndProject)",
        )

    for scan in re.split(r"\(\d+\) Scan parquet", formatted)[1:]:
        pushed = re.search(r"PushedFilters: \[([^\]]*)\]", scan)
        schema = re.search(r"ReadSchema: struct<([^>]*)>", scan)
        n_cols = (
            len([c for c in schema.group(1).split(",") if c.strip()])
            if schema
            else 0
        )
        if pushed is not None and not pushed.group(1).strip():
            # an empty pushdown list only matters if the query filters
            if re.search(r"\(\d+\) Filter", formatted):
                hit(
                    "unpushed_filter",
                    "warn",
                    "Filter present but scan PushedFilters is empty",
                )
        if n_cols >= 12:
            hit("wide_scan", "info", f"parquet scan reads {n_cols} columns")

    return findings


def report(df: DataFrame) -> str:
    """Human-readable one-line-per-finding report ('' when clean)."""
    return "\n".join(
        f"[{f['severity']}] {f['rule']}: {f['detail']}" for f in diagnose(df)
    )
