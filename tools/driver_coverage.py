"""Print which registry entries the driver's correctness sample has and has
NOT ever covered (r10 verdict item 7: the driver has checked the same 50
queries since r6, so the judged coverage number rests on the local gate for
everything else — this makes that blind spot auditable in one command).

Usage: python tools/driver_coverage.py [repo_dir]
"""

from __future__ import annotations

import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    repo = sys.argv[1] if len(sys.argv) > 1 else REPO
    from nosql_based_business_intelligence_system_spark.queries import QUERIES

    seen: dict[str, set[str]] = {}
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        rnd = os.path.basename(path)[len("CORRECTNESS_") : -len(".json")]
        with open(path) as f:
            data = json.load(f)
        for name in data:
            seen.setdefault(name, set()).add(rnd)
    sampled = sorted(n for n in QUERIES if n in seen)
    never = sorted(n for n in QUERIES if n not in seen)
    stale = sorted(n for n in seen if n not in QUERIES)
    print(
        f"registry: {len(QUERIES)} | driver-sampled ever: {len(sampled)} | "
        f"never sampled: {len(never)}"
    )
    print("\nnever driver-sampled (covered only by tools/gate.py's "
          "full-registry sf0.01 verify + pytest):")
    for n in never:
        print(f"  {n}")
    if stale:
        print("\nin driver samples but no longer in registry:")
        for n in stale:
            print(f"  {n}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
