#!/usr/bin/env python
"""Offline analysis plots over driver artifacts
(reference: hpe/useful_aux_scripts/{plot_histograms, plot_je_vs_consistency,
plot_max_stretching, plot_nhyps_lineplot, inspect_multimodality}.py).

Reads an experiment output dir (protocol_1_err.csv, all_seg_errs.npy,
all_jw_err_var.npy, all_pred_hyps.pkl, seg_*.csv) and writes PNGs.

  python tools/plot_analysis.py /path/to/output_dir [more_dirs ...]
"""

import pickle
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402


def plot_seg_err_histograms(out_dir: Path):
    """Segment-error distributions (plot_histograms.py)."""
    path = out_dir / "all_seg_errs.npy"
    if not path.exists():
        return
    errs = np.load(path)  # (N, num_bones)
    fig, ax = plt.subplots(figsize=(8, 4))
    ax.hist(errs.ravel(), bins=80)
    ax.set_xlabel("segment length error (mm)")
    ax.set_ylabel("count")
    fig.savefig(out_dir / "seg_err_hist.png", bbox_inches="tight")
    plt.close(fig)


def plot_je_vs_consistency(out_dirs):
    """Joint error vs MPSCE scatter across experiments
    (plot_je_vs_consistency.py)."""
    points = []
    for d in out_dirs:
        table = d / "protocol_1_err.csv"
        if not table.exists():
            continue
        df = pd.read_csv(table)
        points.append((d.name, float(df["mpjpe"].iloc[-1]),
                       float(df["seg std"].iloc[-1])))
    if not points:
        return
    fig, ax = plt.subplots(figsize=(6, 5))
    for name, mpjpe, mpsce in points:
        ax.scatter(mpjpe, mpsce)
        ax.annotate(name, (mpjpe, mpsce), fontsize=8)
    ax.set_xlabel("MPJPE (mm)")
    ax.set_ylabel("MPSCE (mm)")
    fig.savefig(out_dirs[0] / "je_vs_consistency.png", bbox_inches="tight")
    plt.close(fig)


def plot_max_stretch(out_dir: Path):
    """Per-bone max stretch bars (plot_max_stretching.py)."""
    path = out_dir / "seg_max_strech.csv"
    if not path.exists():
        return
    df = pd.read_csv(path)
    vals = df.iloc[-1, 1:].astype(float)
    fig, ax = plt.subplots(figsize=(10, 4))
    ax.bar(range(len(vals)), vals)
    ax.set_xticks(range(len(vals)))
    ax.set_xticklabels(df.columns[1:], rotation=80, fontsize=7)
    ax.set_ylabel("max stretch (mm)")
    fig.savefig(out_dir / "max_stretch.png", bbox_inches="tight")
    plt.close(fig)


def inspect_multimodality(out_dir: Path):
    """Hypothesis spread per frame (inspect_multimodality.py /
    plot_nhyps_lineplot.py): std over hypotheses of each joint position."""
    path = out_dir / "all_pred_hyps.pkl"
    if not path.exists():
        return
    with open(path, "rb") as f:
        hyps, _ = pickle.load(f)[0]  # (N, H, L, J, 4)
    spread = np.linalg.norm(
        hyps[..., :3] - hyps[..., :3].mean(axis=1, keepdims=True), axis=-1
    ).mean(axis=(0, 1, 3))  # (L,)
    fig, ax = plt.subplots(figsize=(8, 3))
    ax.plot(spread)
    ax.set_xlabel("frame")
    ax.set_ylabel("hypothesis spread (mm)")
    fig.savefig(out_dir / "hypothesis_spread.png", bbox_inches="tight")
    plt.close(fig)


if __name__ == "__main__":
    dirs = [Path(p) for p in sys.argv[1:]]
    assert dirs, __doc__
    for d in dirs:
        plot_seg_err_histograms(d)
        plot_max_stretch(d)
        inspect_multimodality(d)
    plot_je_vs_consistency(dirs)
    print("wrote plots to", ", ".join(str(d) for d in dirs))
