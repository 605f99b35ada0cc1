"""Ad-hoc CLI: run any registry query and print its result.

    python -m nosql_based_business_intelligence_system_spark <query> [sf_dir]
    python -m nosql_based_business_intelligence_system_spark --list [filter]
    python -m nosql_based_business_intelligence_system_spark <query> --explain

The reference is driven as ``python Project.py`` (one shot, prints +
exports); this is the engine's equivalent console surface for a user poking
at one query — the driver contract (__spark_entry__) and bench.py remain
the programmatic surfaces.
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(
        prog="python -m nosql_based_business_intelligence_system_spark",
        description="Run a registry query against the fixture tables.",
    )
    p.add_argument("query", nargs="?", help="registry query name")
    p.add_argument(
        "sf_dir",
        nargs="?",
        default=None,
        help="fixture dir (default: $SPARK_GRAFT_SF_DIR or sf0.1)",
    )
    p.add_argument("--list", action="store_true", help="list query names")
    p.add_argument(
        "--explain", action="store_true", help="print the formatted plan too"
    )
    p.add_argument(
        "--rows", type=int, default=20, help="rows to show (default 20)"
    )
    args = p.parse_args(argv)

    from .queries.registry import QUERIES

    if args.list or not args.query:
        pat = (args.query or "").lower()
        for name, q in sorted(QUERIES.items()):
            if pat in name.lower():
                kind = "oracle" if q.oracle else "rows-only"
                print(f"{name:36s} {kind}")
        return 0
    if args.query not in QUERIES:
        close = [n for n in sorted(QUERIES) if args.query.lower() in n.lower()]
        hint = f" (did you mean: {', '.join(close[:5])}?)" if close else ""
        print(f"unknown query {args.query!r}{hint}", file=sys.stderr)
        return 2

    from .session import get_spark
    from .sources.tables import DEFAULT_SF_DIR

    spark = get_spark(app_name=f"adhoc:{args.query}")
    df = QUERIES[args.query].fn(spark, args.sf_dir or DEFAULT_SF_DIR)
    if args.explain:
        df.explain("formatted")
    df.show(args.rows, truncate=False)
    print(f"({df.count()} rows)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
