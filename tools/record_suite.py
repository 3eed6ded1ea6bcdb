#!/usr/bin/env python
"""Run the full test suite and record per-round green evidence.

VERDICT r3 #5: slow-suite results (trained head-to-heads, LR transfer,
real multi-process multihost) were asserted but never recorded, so a
judge could not cite them without re-running hours of tests. This tool
runs pytest (full suite by default; ``--fast`` deselects slow), parses
the summary, and records {counts, duration, commit, timestamp} to
``tools/artifacts/suite_record.json`` (keyed history) and appends a
``{"type": "suite", ...}`` line to ``PROGRESS.jsonl`` so the evidence
rides the round artifacts.

Duration budget (VERDICT r4 Weak #6): the run always collects pytest's
``--durations`` report and records the slowest tests in the artifact;
``--budget-s N`` additionally FAILS the recording (rc=2) when any
single test exceeds N seconds, catching suite-time creep before the
suite stops being runnable per round.

  python tools/record_suite.py [--fast] [--budget-s 900]
      [--pytest-args "-x"]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
# atomic_write_json lives in the package; script-dir-only sys.path broke
# the record write AFTER a green 70-min run (r5) — insert the repo root
sys.path.insert(0, str(REPO))


def parse_pytest_output(lines):
    """-> (summary counts, slowest tests) from ``-q --durations=N``
    output. Durations lines look like
    ``123.45s call     tests/test_x.py::test_y`` (setup/teardown phases
    are ignored — the call phase is what a budget should bound)."""
    tail = "".join(lines[-80:])
    counts = {
        key: int(m.group(1))
        for key in ("passed", "failed", "error", "skipped", "deselected",
                    "xfailed", "xpassed")
        if (m := re.search(rf"(\d+) {key}", tail))
    }
    slowest = [
        {"s": float(m.group(1)), "test": m.group(2)}
        for line in lines
        if (m := re.match(r"\s*(\d+\.\d+)s call\s+(\S+)", line))
    ]
    slowest.sort(key=lambda d: -d["s"])
    return counts, slowest


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--fast", action="store_true",
                    help="deselect slow tests (-m 'not slow')")
    ap.add_argument("--pytest-args", default="",
                    help="extra pytest args, space-separated")
    ap.add_argument("--log", type=Path, default=None,
                    help="tee full pytest output to this file")
    ap.add_argument("--budget-s", type=float, default=None,
                    help="fail (rc=2) if any single test exceeds this "
                    "many seconds")
    ap.add_argument("--durations", type=int, default=15,
                    help="how many slowest tests to record")
    ap.add_argument("--from-log", type=Path, default=None,
                    help="record from an existing pytest log instead of "
                    "running (recovers a finished run whose recording "
                    "step failed); pair with --rc / --duration-s")
    ap.add_argument("--rc", type=int, default=0,
                    help="exit code of the logged run (--from-log)")
    ap.add_argument("--duration-s", type=float, default=None,
                    help="wall-clock of the logged run (--from-log)")
    args = ap.parse_args()

    cmd = [sys.executable, "-m", "pytest", "tests/", "-q",
           f"--durations={args.durations}", "--durations-min=1.0"]
    if args.fast:
        cmd += ["-m", "not slow"]
    cmd += [a for a in args.pytest_args.split() if a]

    commit = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"], cwd=REPO,
        capture_output=True, text=True,
    ).stdout.strip()
    dirty = bool(subprocess.run(
        ["git", "status", "--porcelain"], cwd=REPO,
        capture_output=True, text=True,
    ).stdout.strip())

    if args.from_log:
        lines = args.from_log.read_text().splitlines(keepends=True)
        rc = args.rc
        duration_s = args.duration_s
        if duration_s is None:  # pytest prints "... in 4223.01s (1:10:23)"
            m = re.search(r" in (\d+\.\d+)s", "".join(lines[-10:]))
            duration_s = float(m.group(1)) if m else None
        cmd = cmd[:1] + [f"(recorded from {args.from_log})"] + cmd[1:]
    else:
        t0 = time.time()
        proc = subprocess.Popen(
            cmd, cwd=REPO, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True,
            # unbuffered child: piped pytest block-buffers its dots,
            # hiding all progress until exit
            env={**os.environ, "PYTHONUNBUFFERED": "1"},
        )
        lines = []
        log_f = open(args.log, "w") if args.log else None
        for line in proc.stdout:
            lines.append(line)
            print(line, end="", flush=True)
            if log_f:
                log_f.write(line)
        rc = proc.wait()
        if log_f:
            log_f.close()
        duration_s = round(time.time() - t0, 1)

    counts, slowest = parse_pytest_output(lines)
    over_budget = (
        [d for d in slowest if d["s"] > args.budget_s]
        if args.budget_s else []
    )
    if over_budget:
        print(
            f"record_suite: {len(over_budget)} test(s) exceed the "
            f"{args.budget_s:.0f}s per-test budget: "
            + ", ".join(f"{d['test']} ({d['s']:.0f}s)"
                        for d in over_budget[:5]),
            flush=True,
        )
        if rc == 0:
            rc = 2
    record = {
        "ts": time.time(),
        "type": "suite",
        "commit": commit,
        "dirty": dirty,
        "cmd": " ".join(cmd[1:]),
        "rc": rc,
        "duration_s": duration_s,
        **counts,
        "slowest": slowest[: args.durations],
        **({"budget_s": args.budget_s,
            "over_budget": [d["test"] for d in over_budget]}
           if args.budget_s else {}),
    }
    print(json.dumps(record), flush=True)

    # MANIPOSE_SUITE_RECORD_DIR redirects both outputs (tests use a
    # tmpdir so pytest-in-pytest runs don't pollute the real records)
    record_root = Path(
        os.environ.get("MANIPOSE_SUITE_RECORD_DIR", "") or REPO
    )
    artifacts = record_root / "tools" / "artifacts"
    artifacts.mkdir(parents=True, exist_ok=True)
    history_path = artifacts / "suite_record.json"
    from manipose_tpu.train.checkpoint import atomic_write_json

    try:
        history = json.loads(history_path.read_text())
    except (OSError, json.JSONDecodeError):
        history = []
    history.append(record)
    atomic_write_json(history_path, history)
    with open(record_root / "PROGRESS.jsonl", "a") as f:
        f.write(json.dumps(record) + "\n")
    sys.exit(rc)


if __name__ == "__main__":
    main()
