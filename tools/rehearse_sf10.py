"""One-command sf10 scale rehearsal (round-6 gate; r5 verdict item 7).

Builds the synthetic sf10 fixture if missing, runs the headline bench at
sf10, then hash-verifies the FULL registry against the DuckDB oracles at
sf10 — the same campaign shape that caught 29 latent bugs at sf1 (r4) and
the estimate-broadcast scale-killer at sf10 (r5), repeatable in one step
so no future round has to rebuild the methodology.

Usage:
    python tools/rehearse_sf10.py [sf_dir] [--bench-only | --verify-only]
                                  [--factor N] [query ...]

Defaults: sf_dir=/tmp/sf10, factor=100 (from /root/testdata/sf0.1).
Extra positional args are forwarded to verify_local as a query subset.

Expected envelope (PLANS.md "Scale notes"): headline wall-clock should
stay within ~4x per 10x data decade, and every query must be hash-green
(or declared rows-only). Exit status is verify_local's.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    args = [a for a in sys.argv[1:]]
    flags = {a for a in args if a.startswith("--") and "=" not in a}
    rest = [a for a in args if not a.startswith("--")]
    sf_dir = rest[0] if rest and os.sep in rest[0] else "/tmp/sf10"
    queries = rest[1:] if rest and os.sep in rest[0] else rest
    factor = "100"
    for a in args:
        if a.startswith("--factor="):
            factor = a.split("=", 1)[1]

    env = dict(os.environ)
    # sf10 broadcast builds + DuckDB twins both need headroom; the local
    # JVM heap is static conf, first-JVM-only (see session.get_spark).
    env.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")
    # Child stdout is usually a pipe/file here: without this the per-query
    # OK lines sit in an 8KB block buffer and the log under-reports
    # progress by dozens of queries.
    env.setdefault("PYTHONUNBUFFERED", "1")
    env["SPARK_GRAFT_SF_DIR"] = sf_dir

    if not os.path.exists(os.path.join(sf_dir, "lineitem.parquet")):
        print(f"[rehearse] building {sf_dir} (factor {factor})", flush=True)
        subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "make_sf.py"),
             sf_dir, factor],
            check=True, env=env,
        )

    rc = 0
    if "--verify-only" not in flags:
        print(f"[rehearse] bench at {sf_dir}", flush=True)
        subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            check=False, env=env,
        )
    if "--bench-only" not in flags:
        # Split-mode verify: the Spark pass and the DuckDB twins never
        # share a process. The spark-only pass keeps DuckDB at the
        # conservative 40GB shared-box default (it barely touches it);
        # the oracle-only pass runs JVM-free and gets most of the box —
        # the quadratic twins (sf10 shingle self-join: ~2.7e9 candidate
        # pairs) spill for an hour under the 40GB cap but run hot at
        # 80GB. (The old shared-mode call set 80GB with a live 24g JVM
        # in-process — the exact config behind the observed 99.9GB-RSS
        # OOM-kill the 40GB cap was added to prevent.)
        rec = os.path.join(
            "/tmp", f"rehearse_rec_{os.path.basename(os.path.normpath(sf_dir))}.json"
        )
        print(f"[rehearse] spark-side verify at {sf_dir} -> {rec}", flush=True)
        rc_spark = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "verify_local.py"),
             f"--spark-only={rec}", sf_dir, *queries],
            check=False, env=env,
        ).returncode
        print(f"[rehearse] JVM-free oracle verify at {sf_dir}", flush=True)
        env_oracle = dict(env)
        env_oracle.setdefault("SPARK_GRAFT_DUCKDB_MEM", "80GB")
        rc_oracle = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "verify_local.py"),
             f"--oracle-only={rec}", sf_dir, *queries],
            check=False, env=env_oracle,
        ).returncode
        rc = rc_spark or rc_oracle
    return rc


if __name__ == "__main__":
    sys.exit(main())
