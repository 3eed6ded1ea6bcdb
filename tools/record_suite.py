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

  python tools/record_suite.py [--fast] [--pytest-args "-x"]
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


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--fast", action="store_true",
                    help="deselect slow tests (-m 'not slow')")
    ap.add_argument("--pytest-args", default="",
                    help="extra pytest args, space-separated")
    ap.add_argument("--log", type=Path, default=None,
                    help="tee full pytest output to this file")
    args = ap.parse_args()

    cmd = [sys.executable, "-m", "pytest", "tests/", "-q"]
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

    t0 = time.time()
    proc = subprocess.Popen(
        cmd, cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True,
        # unbuffered child: piped pytest block-buffers its dots, hiding
        # all progress until exit
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

    tail = "".join(lines[-30:])
    counts = {
        key: int(m.group(1))
        for key in ("passed", "failed", "error", "skipped", "deselected",
                    "xfailed", "xpassed")
        if (m := re.search(rf"(\d+) {key}", tail))
    }
    record = {
        "ts": time.time(),
        "type": "suite",
        "commit": commit,
        "dirty": dirty,
        "cmd": " ".join(cmd[1:]),
        "rc": rc,
        "duration_s": duration_s,
        **counts,
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
