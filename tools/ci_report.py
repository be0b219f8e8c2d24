#!/usr/bin/env python
"""CI test-report generator (reference role: tools/build/cdash.py — the
reference's CDash submission script that packages build + test results
into a dashboard upload).

Runs the pytest suite with JUnit-XML output and renders a one-page
markdown dashboard with per-file rollups and failure details.

    python tools/ci_report.py [--fast] [--out DIR] [pytest args...]

Artifacts (default DIR=ci_report/):
    junit.xml    — standard JUnit XML (consumable by any CI system)
    report.md    — human-readable dashboard page
Exit code mirrors pytest's.
"""

from __future__ import annotations

import os
import subprocess
import sys
import time
import xml.etree.ElementTree as ET
from collections import defaultdict


def run(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    out_dir = "ci_report"
    if "--out" in argv:
        i = argv.index("--out")
        out_dir = argv[i + 1]
        del argv[i:i + 2]
    fast = "--fast" in argv
    if fast:
        argv.remove("--fast")
    os.makedirs(out_dir, exist_ok=True)
    junit = os.path.join(out_dir, "junit.xml")
    cmd = [sys.executable, "-m", "pytest", "tests/", "-q",
           f"--junitxml={junit}"]
    if fast:
        cmd += ["-m", "not slow"]
    cmd += argv
    t0 = time.time()
    proc = subprocess.run(cmd)
    wall = time.time() - t0
    write_report(junit, os.path.join(out_dir, "report.md"), wall,
                 " ".join(cmd))
    return proc.returncode


def write_report(junit_path, md_path, wall, cmd):
    root = ET.parse(junit_path).getroot()
    suites = root.iter("testsuite")
    rows = defaultdict(lambda: {"pass": 0, "fail": 0, "error": 0,
                                "skip": 0, "time": 0.0})
    failures = []
    totals = {"pass": 0, "fail": 0, "error": 0, "skip": 0, "time": 0.0}
    for suite in suites:
        for case in suite.iter("testcase"):
            parts = case.get("classname", "").split(".")
            f = next(
                (p for p in parts if p.startswith("test_")),
                parts[0] or "unknown",
            )
            dt = float(case.get("time", 0.0))
            rows[f]["time"] += dt
            totals["time"] += dt
            kind = "pass"
            for tag in ("failure", "error", "skipped"):
                node = case.find(tag)
                if node is not None:
                    kind = {"failure": "fail", "error": "error",
                            "skipped": "skip"}[tag]
                    if kind in ("fail", "error"):
                        failures.append(
                            (f, case.get("name"),
                             (node.get("message") or "")[:400])
                        )
                    break
            rows[f][kind] += 1
            totals[kind] += 1
    n = sum(totals[k] for k in ("pass", "fail", "error", "skip"))
    status = "PASS" if totals["fail"] + totals["error"] == 0 else "FAIL"
    with open(md_path, "w") as f:
        f.write(f"# fvm_tpu test dashboard — {status}\n\n")
        f.write(f"`{cmd}`\n\n")
        f.write(
            f"**{totals['pass']}/{n} passed**, {totals['fail']} failed, "
            f"{totals['error']} errors, {totals['skip']} skipped — "
            f"suite time {totals['time']:.0f}s (wall {wall:.0f}s)\n\n"
        )
        f.write("| test file | pass | fail | error | skip | time (s) |\n")
        f.write("|---|---:|---:|---:|---:|---:|\n")
        for name in sorted(rows, key=lambda k: -rows[k]["time"]):
            r = rows[name]
            f.write(
                f"| {name} | {r['pass']} | {r['fail']} | {r['error']} | "
                f"{r['skip']} | {r['time']:.1f} |\n"
            )
        if failures:
            f.write("\n## Failures\n\n")
            for fname, tname, msg in failures:
                f.write(f"- **{fname}::{tname}** — {msg}\n")
    print(f"# wrote {md_path} ({status})", file=sys.stderr)


if __name__ == "__main__":
    sys.exit(run())
