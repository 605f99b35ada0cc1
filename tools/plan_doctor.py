"""Run the plan doctor over registry queries.

Usage:
    python tools/plan_doctor.py [sf_dir] [query ...]   # default: all

Prints one line per query: `clean` or the findings. Exit code 1 if any
error-severity finding exists (declared exceptions in
tools/dump_plans.py FLAGSHIP_ALLOWS are honored).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args.pop(0) if args and os.path.isdir(args[0]) else "/root/testdata/sf0.001"

    from nosql_based_business_intelligence_system_spark.plans import doctor
    from nosql_based_business_intelligence_system_spark.queries.registry import QUERIES
    from nosql_based_business_intelligence_system_spark.session import get_spark

    spark = get_spark()
    names = args or list(QUERIES)
    n_errors = 0
    for name in names:
        try:
            df = QUERIES[name].fn(spark, sf_dir)
            findings = doctor.diagnose(df, allow=doctor.QUERY_ALLOWS.get(name))
        except Exception as e:  # surface, keep going
            print(f"ERROR {name}: {e}")
            n_errors += 1
            continue
        if not findings:
            print(f"clean {name}")
        else:
            tags = "; ".join(
                f"[{f['severity']}] {f['rule']}: {f['detail']}" for f in findings
            )
            print(f"      {name}: {tags}")
            n_errors += sum(1 for f in findings if f["severity"] == "error")
    return 1 if n_errors else 0


if __name__ == "__main__":
    raise SystemExit(main())
