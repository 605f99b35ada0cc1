"""Pre-snapshot gate (round-7 verdict item 6): ONE command that must be
green before an end-of-round snapshot commit.

Runs, in order, failing fast:

1. pytest (full suite)
2. full-registry oracle verify at sf0.01 (tools/verify_local.py — the
   same compare the driver's correctness gate runs, but over ALL
   queries instead of its 50-row sample; this is what protects against
   the r5 failure mode of a red final commit)
3. plan doctor over the full registry (tools/plan_doctor.py)
4. bench at the driver's sf (must emit its one JSON line, rc 0)

Usage:
    python tools/gate.py [--skip-bench] [--skip-pytest]

Exit 0 only if every stage passes. The end-of-round snapshot commit
message should cite the gate run.
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(label: str, cmd: list[str], env: dict | None = None) -> bool:
    print(f"\n[gate] === {label}: {' '.join(cmd)}", flush=True)
    t0 = time.time()
    rc = subprocess.run(cmd, cwd=REPO, env=env, check=False).returncode
    print(f"[gate] {label}: rc={rc} [{time.time()-t0:.0f}s]", flush=True)
    return rc == 0


def main() -> int:
    flags = set(sys.argv[1:])
    env = dict(os.environ)
    env.setdefault("PYTHONUNBUFFERED", "1")

    stages: list[tuple[str, list[str]]] = []
    if "--skip-pytest" not in flags:
        stages.append(("pytest", [sys.executable, "-m", "pytest", "tests/", "-x", "-q"]))
    stages.append(
        (
            "verify sf0.01 full registry",
            [sys.executable, "tools/verify_local.py", "/root/testdata/sf0.01"],
        )
    )
    stages.append(("plan doctor", [sys.executable, "tools/plan_doctor.py"]))
    if "--skip-bench" not in flags:
        stages.append(("bench", [sys.executable, "bench.py"]))

    for label, cmd in stages:
        if not _run(label, cmd, env):
            print(f"\n[gate] FAILED at: {label}", flush=True)
            return 1
    print("\n[gate] ALL GREEN", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
