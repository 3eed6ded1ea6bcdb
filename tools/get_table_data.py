#!/usr/bin/env python
"""Aggregate multi-seed experiment metrics into a results table
(reference: hpe/useful_aux_scripts/get_table2_data.py, which pulls MLflow
CSVs into LaTeX).

Reads metrics.txt / protocol_1_err.csv from experiment output dirs whose
names end in `_seed<N>`, groups by the prefix, and prints mean±std
markdown + LaTeX rows (the toy Table 1/6 aggregation).

  python tools/get_table_data.py outputs_toy/*
"""

import re
import sys
from collections import defaultdict
from pathlib import Path

import numpy as np
import pandas as pd


def read_metrics(d: Path) -> dict:
    metrics = {}
    mfile = d / "metrics.txt"
    if mfile.exists():
        for line in mfile.read_text().splitlines():
            parts = line.split(": ")
            if len(parts) != 2:
                continue  # blank / malformed line: skip, don't abort
            try:
                metrics[parts[0]] = float(parts[1])
            except ValueError:
                continue
    table = d / "protocol_1_err.csv"
    if table.exists():
        df = pd.read_csv(table)
        row = df.iloc[-1]
        for col in df.columns[1:]:
            metrics[col] = float(row[col])
    return metrics


if __name__ == "__main__":
    dirs = [Path(p) for p in sys.argv[1:]]
    assert dirs, __doc__
    groups = defaultdict(list)
    for d in dirs:
        # accept both .../experiment_seedN and .../experiment_seedN/default
        target = d / "default" if (d / "default").exists() else d
        m = read_metrics(target)
        if not m:
            continue
        key = re.sub(r"_seed\d+$", "", d.name)
        groups[key].append(m)

    keys = sorted({k for ms in groups.values() for m in ms for k in m})
    header = "| experiment | n | " + " | ".join(keys) + " |"
    print(header)
    print("|" + "---|" * (len(keys) + 2))
    latex_rows = []
    for name, ms in sorted(groups.items()):
        cells = []
        for k in keys:
            vals = [m[k] for m in ms if k in m]
            cells.append(
                f"{np.mean(vals):.3f}±{np.std(vals):.3f}" if vals else "-"
            )
        print(f"| {name} | {len(ms)} | " + " | ".join(cells) + " |")
        latex_rows.append(name + " & " + " & ".join(cells) + r" \\")
    print()
    print("% LaTeX:")
    print("\n".join(latex_rows))
