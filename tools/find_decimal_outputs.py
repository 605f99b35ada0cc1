"""List every registry query whose output schema contains a DecimalType.

These fail the external driver's hash gate (round-2 verdict: 15/15 hash
failures were exactly the DECIMAL-typed outputs). Run at sf0.001 — schema
construction only, nothing is executed.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql.types import DecimalType

import __spark_entry__ as entry
from nosql_based_business_intelligence_system_spark.session import get_spark

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"


def main() -> int:
    spark = get_spark()
    bad = []
    for name, fn in sorted(entry.queries().items()):
        try:
            schema = fn(spark, SF).schema
        except Exception as e:  # noqa: BLE001 - report, keep sweeping
            print(f"ERROR {name}: {e}", file=sys.stderr)
            continue
        dec = [f.name for f in schema.fields if isinstance(f.dataType, DecimalType)]
        if dec:
            bad.append((name, dec))
            print(f"DECIMAL {name}: {dec}")
    print(f"-- {len(bad)} queries with DecimalType outputs", file=sys.stderr)
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
