"""Offline-analysis tool suite (tools/plot_analysis.py,
tools/eval_baselines.py): every reference aux-script output must be
reproducible from driver artifacts (VERDICT r1 item #6)."""

import pickle
import subprocess
import sys
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO / "tools"))

import plot_analysis  # noqa: E402

from manipose_tpu.geometry import h36m_skeleton_17  # noqa: E402

SKEL = h36m_skeleton_17()
ACTIONS = ["walking", "eating", "sitting"]


def _make_run_dir(tmp_path: Path, name: str, seed: int, rmcl=True) -> Path:
    """Synthesize the artifact set the H36M driver dumps per run."""
    d = tmp_path / name
    d.mkdir()
    rng = np.random.default_rng(seed)
    n_act = len(ACTIONS)
    act_col = np.array(ACTIONS + ["average"])

    def csv(fname, cols, values):
        values = np.asarray(values, float)
        values = np.vstack([values, values.mean(axis=0, keepdims=True)])
        df = pd.DataFrame(
            np.hstack([act_col[:, None], values.astype(str)]),
            columns=["act", *cols],
        )
        df.to_csv(d / f"{fname}.csv", index=False)

    head = ["mpjpe", "sag sym", "seg std", "p-mpjpe", "mvjpe", "mse",
            "err var", "seg err"]
    if rmcl:
        head += ["oracle mpjpe", "pseudo oracle mpjpe"]
    csv("protocol_1_err", head, 40 + rng.uniform(0, 20, (n_act, len(head))))
    csv("jw_err", SKEL.joints_names, rng.uniform(20, 70, (n_act, 17)))
    csv("cw_err", ["x", "y", "z"], rng.uniform(10, 40, (n_act, 3)))
    csv("seg_consistency", SKEL.bones_names,
        rng.uniform(0, 12, (n_act, SKEL.num_bones)))
    csv("seg_symmetry", SKEL.bones_names,
        rng.uniform(0, 9, (n_act, SKEL.num_bones)))
    csv("seg_max_strech", SKEL.bones_names,
        rng.uniform(0, 30, (n_act, SKEL.num_bones)))
    np.save(d / "all_seg_errs.npy",
            rng.normal(0, 10, (500, SKEL.num_bones)).astype(np.float32))
    hyps = [
        (rng.normal(0, 40, (2, 5, 6, 17, 4)).astype(np.float32),
         rng.normal(0, 40, (2, 6, 17, 3)).astype(np.float32))
        for _ in ACTIONS
    ]
    with open(d / "all_pred_hyps.pkl", "wb") as f:
        pickle.dump(hyps, f)
    return d


class TestPlotAnalysis:
    def test_model_comparison_bars_all_suites(self, tmp_path):
        d1 = _make_run_dir(tmp_path, "mixste", 0)
        d2 = _make_run_dir(tmp_path, "manipose", 1)
        written = plot_analysis.plot_model_comparison_bars(
            [d1, d2], ["MixSTE", "ManiPose"], tmp_path
        )
        names = {p.name for p in written}
        assert names == {"jw_err_bars.png", "cw_err_bars.png",
                         "seg_consistency_bars.png", "seg_symmetry_bars.png"}
        assert all(p.stat().st_size > 0 for p in written)

    def test_per_action_facets(self, tmp_path):
        d1 = _make_run_dir(tmp_path, "a", 0)
        d2 = _make_run_dir(tmp_path, "b", 1)
        out = plot_analysis.plot_per_action_facets(
            [d1, d2], ["A", "B"], tmp_path, "jw_err"
        )
        assert out.exists() and out.stat().st_size > 0

    def test_seg_err_histograms_per_bone(self, tmp_path):
        d = _make_run_dir(tmp_path, "run", 0)
        plot_analysis.plot_seg_err_histograms(d)
        assert (d / "seg_err_hist.png").exists()
        assert (d / "seg_err_hist_per_bone.png").exists()

    def test_sweep_lineplot_with_oracle(self, tmp_path):
        dirs = [_make_run_dir(tmp_path, f"k{k}", k) for k in (2, 3, 5)]
        out = plot_analysis.plot_sweep_lineplot(
            dirs, [2, 3, 5], tmp_path, param_name="K"
        )
        assert out.exists() and out.name == "sweep_K_lineplot.png"

    def test_multimodality_heatmap(self, tmp_path):
        d = _make_run_dir(tmp_path, "run", 0)
        plot_analysis.inspect_multimodality(d)
        assert (d / "hypothesis_spread.png").exists()
        assert (d / "multimodality_heatmap.png").exists()

    def test_cli_end_to_end(self, tmp_path):
        d1 = _make_run_dir(tmp_path, "m1", 0)
        d2 = _make_run_dir(tmp_path, "m2", 1)
        plot_analysis.main([str(d1), str(d2), "--labels", "m1", "m2",
                            "--sweep-param", "K=2,5"])
        assert (d1 / "je_vs_consistency.png").exists()
        assert (d1 / "max_stretch.png").exists()
        assert (d1 / "sweep_K_lineplot.png").exists()


class TestEvalBaselinesPck:
    def test_pck_protocol_on_dumps(self, tmp_path):
        rng = np.random.default_rng(0)
        t = rng.normal(scale=100, size=(2, 8, 17, 3)).astype(np.float32)
        p = t + rng.normal(scale=20, size=t.shape).astype(np.float32)
        np.save(tmp_path / "p.npy", p)
        np.save(tmp_path / "t.npy", t)
        out = subprocess.run(
            [sys.executable, str(REPO / "tools" / "eval_baselines.py"),
             str(tmp_path / "p.npy"), str(tmp_path / "t.npy"),
             "--skeleton=3dhp", "--pck"],
            capture_output=True, text=True, timeout=600,
        )
        assert out.returncode == 0, out.stderr[-2000:]
        assert "3DPCK@150mm" in out.stdout and "AUC 0-150mm" in out.stdout
        pck = float(out.stdout.split("3DPCK@150mm (none):")[1].split()[0])
        auc = float(out.stdout.split("AUC 0-150mm (none):")[1].split()[0])
        assert 0.0 <= auc <= pck <= 100.0


class TestGtJointDensity:
    """Data-side multimodality inspection (inspect_multimodality.py GT
    density projections) from a real Human36mDataset pipeline."""

    def test_density_plot_from_dataset(self, tmp_path):
        from manipose_tpu.config import load_config
        from manipose_tpu.drivers.h36m import fetch_and_prepare_data

        # synthetic H36M-format npz pair (mirrors the driver fixtures)
        data_dir = tmp_path / "h36m"
        data_dir.mkdir()
        rng = np.random.default_rng(0)
        subjects, actions, n_frames = ["S1"], ["Walking"], 40
        positions_3d = {
            s: {a: rng.normal(scale=0.3, size=(n_frames, 32, 3)).astype(np.float32)
                for a in actions} for s in subjects
        }
        np.savez(data_dir / "data_3d_h36m.npz", positions_3d=positions_3d)
        positions_2d = {
            s: {a: [rng.uniform(0, 1000, size=(n_frames, 17, 2)).astype(np.float32)
                    for _ in range(4)]
                for a in actions} for s in subjects
        }
        np.savez(data_dir / "data_2d_h36m_cpn_ft_h36m_dbb.npz",
                 positions_2d=positions_2d)

        cfg = load_config("config", overrides=[
            f"data.data_dir={data_dir}", "data.actions=walking",
        ])
        keypoints, dataset = fetch_and_prepare_data(cfg)
        out = plot_analysis.plot_gt_joint_density(
            dataset, keypoints, subject="S1", action="walking",
            joint="RWrist", save_path=tmp_path / "dens.png",
            u_cond=0.1, v_cond=-0.2,
        )
        assert Path(out).exists() and Path(out).stat().st_size > 5_000
