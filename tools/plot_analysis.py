#!/usr/bin/env python
"""Offline analysis plots over driver artifacts — reproduces the outputs
of the reference notebook suite (hpe/useful_aux_scripts/):

  plot_histograms.py        -> model-comparison bar suites (per-joint /
                               per-coordinate / per-bone / per-bone-pair)
                               + per-action facet grids + per-bone
                               segment-error histograms
  plot_je_vs_consistency.py -> MPJPE vs MPSCE scatter across experiments
  plot_max_stretching.py    -> per-bone max-stretch bars
  plot_nhyps_lineplot.py    -> aggregated+oracle MPJPE vs K (and vs beta)
                               over a run sweep
  inspect_multimodality.py  -> per-action/per-joint hypothesis-spread
                               heatmap (model side) and GT joint-density
                               projections (data side, needs the dataset)

All plots work from the artifacts the drivers dump per run dir:
protocol_1_err.csv, jw_err.csv, cw_err.csv, seg_consistency.csv,
seg_symmetry.csv, seg_max_strech.csv, all_seg_errs.npy, all_pred_hyps.pkl.

  python tools/plot_analysis.py RUN_DIR [RUN_DIR2 ...] [--labels A B]
      [--sweep-param K=2,3,5]   # maps run dirs to a swept HP for lineplots
"""

import argparse
import pickle
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402


def _load_csv(out_dir: Path, name: str):
    path = out_dir / f"{name}.csv"
    if not path.exists():
        return None
    return pd.read_csv(path)


def _bar_groups(ax, frames, labels, colors=None):
    """Grouped bars: frames is a list of 1D Series with a common index."""
    n_models = len(frames)
    n_items = len(frames[0])
    width = 0.8 / n_models
    xs = np.arange(n_items)
    for m, (series, label) in enumerate(zip(frames, labels)):
        ax.bar(xs + (m - (n_models - 1) / 2) * width, series.values,
               width=width, label=label,
               color=None if colors is None else colors[m % len(colors)])
    ax.set_xticks(xs)
    ax.set_xticklabels(frames[0].index, rotation=80, fontsize=7)


# ---------------------------------------------------------------------------
# plot_histograms.py equivalents
# ---------------------------------------------------------------------------
def plot_model_comparison_bars(out_dirs, labels, save_dir: Path):
    """Joint-wise / coordinate-wise / per-bone consistency / per-bone-pair
    symmetry grouped bars across models, from the driver CSVs
    (reference plot_histograms.py:88-331)."""
    suites = [
        ("jw_err", "Joint-wise MPJPE [mm]", "jw_err_bars.png"),
        ("cw_err", "Coordinate-wise MPJPE [mm]", "cw_err_bars.png"),
        ("seg_consistency", "Per-bone seg. length STD [mm]",
         "seg_consistency_bars.png"),
        ("seg_symmetry", "Per-bone symmetry gap [mm]", "seg_symmetry_bars.png"),
    ]
    written = []
    for name, ylabel, fname in suites:
        rows, used_labels = [], []
        for d, lab in zip(out_dirs, labels):
            df = _load_csv(d, name)
            if df is None:
                continue
            avg = df.iloc[-1, 1:].astype(float)  # "average" action row
            rows.append(avg)
            used_labels.append(lab)
        if not rows:
            continue
        fig, ax = plt.subplots(figsize=(max(6, 0.5 * len(rows[0])), 3.5))
        _bar_groups(ax, rows, used_labels)
        ax.set_ylabel(ylabel)
        ax.legend(ncol=len(rows), fontsize=8)
        fig.savefig(save_dir / fname, bbox_inches="tight")
        plt.close(fig)
        written.append(save_dir / fname)
    return written


def plot_per_action_facets(out_dirs, labels, save_dir: Path,
                           metric: str = "jw_err"):
    """Per-action facet grid of a per-joint/bone metric across models
    (the per-action depth of reference plot_histograms.py)."""
    tables = []
    for d, lab in zip(out_dirs, labels):
        df = _load_csv(d, metric)
        if df is not None:
            tables.append((lab, df))
    if not tables:
        return None
    actions = tables[0][1].iloc[:-1, 0].tolist()  # drop "average"
    n = len(actions)
    ncols = 3
    nrows = int(np.ceil(n / ncols))
    fig, axes = plt.subplots(nrows, ncols,
                             figsize=(5 * ncols, 2.6 * nrows),
                             sharex=True, squeeze=False)
    for i, action in enumerate(actions):
        ax = axes[i // ncols][i % ncols]
        rows = [df.iloc[i, 1:].astype(float) for _, df in tables]
        _bar_groups(ax, rows, [lab for lab, _ in tables])
        ax.set_title(str(action), fontsize=9)
    for j in range(n, nrows * ncols):
        axes[j // ncols][j % ncols].set_axis_off()
    axes[0][0].legend(fontsize=8)
    fig.suptitle(f"{metric} per action")
    out = save_dir / f"{metric}_per_action.png"
    fig.savefig(out, bbox_inches="tight")
    plt.close(fig)
    return out


def plot_seg_err_histograms(out_dir: Path):
    """Segment-error distributions: pooled + per-bone facet grid
    (plot_histograms.py per-bone depth)."""
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

    # per-bone facets; bone names from the consistency CSV when present
    names = None
    df = _load_csv(out_dir, "seg_consistency")
    if df is not None and len(df.columns) == errs.shape[1] + 1:
        names = list(df.columns[1:])
    nb = errs.shape[1]
    ncols = 4
    nrows = int(np.ceil(nb / ncols))
    fig, axes = plt.subplots(nrows, ncols, figsize=(3 * ncols, 2 * nrows),
                             squeeze=False)
    for b in range(nb):
        ax = axes[b // ncols][b % ncols]
        ax.hist(errs[:, b], bins=40)
        ax.set_title(names[b] if names else f"bone {b}", fontsize=8)
    for j in range(nb, nrows * ncols):
        axes[j // ncols][j % ncols].set_axis_off()
    fig.suptitle("segment length error per bone (mm)")
    fig.tight_layout()
    fig.savefig(out_dir / "seg_err_hist_per_bone.png", bbox_inches="tight")
    plt.close(fig)


# ---------------------------------------------------------------------------
def plot_je_vs_consistency(out_dirs, labels=None):
    """Joint error vs MPSCE scatter across experiments
    (plot_je_vs_consistency.py)."""
    labels = labels or [d.name for d in out_dirs]
    points = []
    for d, lab in zip(out_dirs, labels):
        df = _load_csv(d, "protocol_1_err")
        if df is None:
            continue
        points.append((lab, float(df["mpjpe"].iloc[-1]),
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
    df = _load_csv(out_dir, "seg_max_strech")
    if df is None:
        return
    vals = df.iloc[-1, 1:].astype(float)
    fig, ax = plt.subplots(figsize=(10, 4))
    ax.bar(range(len(vals)), vals)
    ax.set_xticks(range(len(vals)))
    ax.set_xticklabels(df.columns[1:], rotation=80, fontsize=7)
    ax.set_ylabel("max stretch (mm)")
    fig.savefig(out_dir / "max_stretch.png", bbox_inches="tight")
    plt.close(fig)


# ---------------------------------------------------------------------------
# plot_nhyps_lineplot.py equivalent: sweep lineplots from run dirs
# ---------------------------------------------------------------------------
def plot_sweep_lineplot(out_dirs, sweep_values, save_dir: Path,
                        param_name: str = "K"):
    """Aggregated + oracle MPJPE vs a swept hyper-parameter
    (plot_nhyps_lineplot.py:47-61 — but pulled from run artifacts instead
    of hardcoded paper numbers)."""
    assert len(out_dirs) == len(sweep_values), (
        f"{len(out_dirs)} run dirs vs {len(sweep_values)} sweep values — "
        "zip would silently drop the excess"
    )
    rows = []
    for d, v in zip(out_dirs, sweep_values):
        df = _load_csv(d, "protocol_1_err")
        if df is None:
            continue
        row = {"param": v, "mpjpe": float(df["mpjpe"].iloc[-1])}
        if "oracle mpjpe" in df.columns:
            row["oracle"] = float(df["oracle mpjpe"].iloc[-1])
        rows.append(row)
    if not rows:
        return None
    rows.sort(key=lambda r: r["param"])
    xs = [r["param"] for r in rows]
    fig, ax = plt.subplots(figsize=(4, 2.5))
    ax.plot(xs, [r["mpjpe"] for r in rows], "--", marker="o", lw=2,
            label="Aggregated MPJPE")
    if all("oracle" in r for r in rows):
        ax.plot(xs, [r["oracle"] for r in rows], marker="s", lw=2,
                label="Oracle MPJPE")
    ax.set_xticks(xs)
    ax.set_xlabel(f"{param_name}")
    ax.set_ylabel("[mm]")
    ax.legend(loc=0, fontsize=8)
    ax.grid(True, alpha=0.4)
    out = save_dir / f"sweep_{param_name}_lineplot.png"
    fig.savefig(out, bbox_inches="tight")
    plt.close(fig)
    return out


# ---------------------------------------------------------------------------
# inspect_multimodality.py equivalents
# ---------------------------------------------------------------------------
def inspect_multimodality(out_dir: Path):
    """Model-side multimodality: per-action x per-joint hypothesis-spread
    heatmap + per-frame spread line (inspect_multimodality.py, moved from
    GT densities to the trained model's hypothesis field)."""
    path = out_dir / "all_pred_hyps.pkl"
    if not path.exists():
        return
    with open(path, "rb") as f:
        per_action = pickle.load(f)  # list of (hyps (N,H,L,J,4), targets)

    # per-frame pooled spread (round-1 plot, kept)
    hyps0 = per_action[0][0]
    spread0 = np.linalg.norm(
        hyps0[..., :3] - hyps0[..., :3].mean(axis=1, keepdims=True), axis=-1
    ).mean(axis=(0, 1, 3))
    fig, ax = plt.subplots(figsize=(8, 3))
    ax.plot(spread0)
    ax.set_xlabel("frame")
    ax.set_ylabel("hypothesis spread (mm)")
    fig.savefig(out_dir / "hypothesis_spread.png", bbox_inches="tight")
    plt.close(fig)

    # per-action x per-joint heatmap
    actions = None
    df = _load_csv(out_dir, "protocol_1_err")
    if df is not None and len(df) - 1 == len(per_action):
        actions = df.iloc[:-1, 0].tolist()
    joints = None
    jw = _load_csv(out_dir, "jw_err")
    if jw is not None:
        joints = list(jw.columns[1:])
    mat = np.stack([
        np.linalg.norm(
            h[..., :3] - h[..., :3].mean(axis=1, keepdims=True), axis=-1
        ).mean(axis=(0, 1, 2))  # (J,)
        for h, _ in per_action
    ])  # (A, J)
    fig, ax = plt.subplots(
        figsize=(max(6, 0.4 * mat.shape[1]), max(3, 0.35 * mat.shape[0]))
    )
    im = ax.imshow(mat, aspect="auto", cmap="viridis")
    ax.set_xticks(range(mat.shape[1]))
    ax.set_xticklabels(joints or range(mat.shape[1]), rotation=80, fontsize=7)
    ax.set_yticks(range(mat.shape[0]))
    ax.set_yticklabels(actions or range(mat.shape[0]), fontsize=7)
    fig.colorbar(im, label="hypothesis spread (mm)")
    ax.set_title("multi-hypothesis spread per action / joint")
    fig.savefig(out_dir / "multimodality_heatmap.png", bbox_inches="tight")
    plt.close(fig)


def plot_gt_joint_density(dataset, keypoints, subject: str, action: str,
                          joint: str, save_path,
                          u_cond=None, v_cond=None):
    """Data-side multimodality: GT joint-position density projected on the
    (u, z) and (v, z) planes over all cameras, with optional conditioning
    lines (inspect_multimodality.py:118-200). Needs the H36M dataset."""
    from manipose_tpu.data.h36m import fetch

    poses_3d, poses_2d, _, _ = fetch(
        [subject], dataset, keypoints, action_filter=[action]
    )
    j = list(dataset.skeleton.joints_names).index(joint)
    p3 = np.concatenate([np.asarray(p)[:, j] for p in poses_3d], axis=0)
    p2 = np.concatenate([np.asarray(p)[:, j] for p in poses_2d], axis=0)

    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(7, 3.2),
                                   sharex=True, sharey=True)
    for ax, horiz, cond in ((ax1, p2[:, 0], u_cond), (ax2, p2[:, 1], v_cond)):
        ax.hist2d(horiz, p3[:, 2], bins=60, cmap="Blues")
        if cond is not None:
            ax.axvline(cond, color="r", linestyle="--")
        ax.set_ylabel("z")
    ax1.set_xlabel("u")
    ax2.set_xlabel("v")
    fig.suptitle(f"{joint} density — {subject}/{action} (all cameras)")
    fig.tight_layout()
    fig.savefig(save_path, bbox_inches="tight")
    plt.close(fig)
    return save_path


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("dirs", nargs="+", type=Path)
    p.add_argument("--labels", nargs="+", default=None)
    p.add_argument("--sweep-param", default=None,
                   help="NAME=v1,v2,... maps run dirs to a swept HP")
    args = p.parse_args(argv)

    dirs = args.dirs
    labels = args.labels or [d.name for d in dirs]
    for d in dirs:
        plot_seg_err_histograms(d)
        plot_max_stretch(d)
        inspect_multimodality(d)
    plot_je_vs_consistency(dirs, labels)
    plot_model_comparison_bars(dirs, labels, dirs[0])
    for metric in ("jw_err", "seg_consistency", "seg_symmetry"):
        plot_per_action_facets(dirs, labels, dirs[0], metric)
    if args.sweep_param:
        name, _, vals = args.sweep_param.partition("=")
        values = [float(v) for v in vals.split(",")]
        plot_sweep_lineplot(dirs, values, dirs[0], name)
    print("wrote plots to", ", ".join(str(d) for d in dirs))


if __name__ == "__main__":
    main()
