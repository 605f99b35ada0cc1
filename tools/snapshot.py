"""Mechanized end-of-round snapshot (r11 verdict item 3).

The README pre-snapshot checklist — run ``tools/gate.py``, paste its
invocation + summary into the round's final commit — failed as a manual
habit in 4 rounds out of 5 (r7, r8, r9, r11). This tool makes it one
command that CANNOT produce an uncited snapshot:

    python tools/snapshot.py "round 12: end-of-round snapshot (...)"

1. runs ``python tools/gate.py`` with output teed to a log file,
2. REFUSES to commit (exit 1) if any gate stage is red,
3. parses the evidence lines (pytest pass count, verify failure count +
   rows-only skips, doctor exit, the bench JSON line) and
4. runs ``git add -A && git commit`` itself, with the gate invocation and
   parsed summary embedded in the commit message.

Extra args after the message are passed through to gate.py (e.g.
``--skip-pytest`` when the full suite already ran this session and the
tree is unchanged — the commit message then records the skip honestly).
"""

from __future__ import annotations

import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _gate_summary(log: str) -> list[str]:
    """Pull the evidence lines out of a gate log."""
    lines: list[str] = []
    m = re.findall(r"(\d+) passed[^\n]*", log)
    if m:
        lines.append(f"pytest: {m[-1]} passed, 0 failed")
    for pat, label in (
        (r"skipped (\d+) rows-only[^\n]*", "verify rows-only skips"),
        (r"(\d+) failures", "verify failures"),
    ):
        m = re.findall(pat, log)
        if m:
            lines.append(f"{label}: {m[-1]}")
    for raw in log.splitlines():
        if raw.startswith('{"metric"'):
            lines.append(f"bench: {raw.strip()}")
    for raw in log.splitlines():
        if raw.startswith("[gate]") and ("rc=" in raw or "ALL GREEN" in raw):
            lines.append(raw.strip())
    return lines


def main() -> int:
    if len(sys.argv) < 2:
        print("usage: python tools/snapshot.py '<commit headline>' [gate args...]")
        return 2
    headline = sys.argv[1]
    gate_args = sys.argv[2:]

    dirty = subprocess.run(
        ["git", "status", "--porcelain"], cwd=REPO, capture_output=True, text=True
    ).stdout.strip()

    invocation = " ".join(["python", "tools/gate.py", *gate_args]).strip()
    log_path = os.path.join(REPO, ".gate_last_run.log")
    t0 = time.time()
    with open(log_path, "w") as fh:
        p = subprocess.Popen(
            [sys.executable, "tools/gate.py", *gate_args],
            cwd=REPO,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        assert p.stdout is not None
        for line in p.stdout:
            sys.stdout.write(line)
            fh.write(line)
        rc = p.wait()
    wall = time.time() - t0
    with open(log_path) as fh:
        log = fh.read()

    if rc != 0:
        print(f"\n[snapshot] gate RED (rc={rc}) — refusing to commit", flush=True)
        return 1

    summary = _gate_summary(log)
    msg = headline + "\n\n" + f"Gate: {invocation}  (rc=0, {wall:.0f}s)\n"
    msg += "".join(f"  {s}\n" for s in summary)
    if dirty:
        msg += "\n(gate ran against the tree including then-uncommitted changes)\n"

    subprocess.run(["git", "add", "-A"], cwd=REPO, check=True)
    c = subprocess.run(
        ["git", "commit", "--allow-empty", "-m", msg], cwd=REPO, check=False
    )
    if c.returncode != 0:
        print("[snapshot] git commit failed", flush=True)
        return 1
    print("\n[snapshot] committed with gate citation:", flush=True)
    print(msg)
    return 0


if __name__ == "__main__":
    sys.exit(main())
