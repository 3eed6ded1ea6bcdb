"""Smoke coverage for the remaining CLI tools (count_n_params,
get_table_data, mup_coord_check) — each must run end-to-end and produce
sane output."""

import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]


def _run(args, timeout=900):
    import os

    env = dict(os.environ, MANIPOSE_PLATFORM="cpu")
    out = subprocess.run(
        [sys.executable, *args], capture_output=True, text=True,
        timeout=timeout, cwd=REPO, env=env,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    return out.stdout


def test_count_n_params_small_config():
    stdout = _run([
        "tools/count_n_params.py", "model.channels=64", "model.layers=2",
        "model.channels_seg=32", "model.layers_seg=2", "data.seq_len=27",
    ])
    # all three families reported with positive counts
    for arch in ("mixste", "manifold", "rmcl_manifold"):
        assert arch in stdout, stdout
    import re

    counts = [int(s.replace(",", ""))
              for s in re.findall(r"([\d,]{4,}) params", stdout)]
    assert len(counts) == 3 and all(c > 10_000 for c in counts), stdout


def test_get_table_data_aggregates_seeds(tmp_path):
    for seed, mpjpe in ((1, 0.70), (2, 0.74), (3, 0.72)):
        d = tmp_path / f"manipose_seed{seed}"
        d.mkdir()
        (d / "metrics.txt").write_text(
            f"test_mpjpe: {mpjpe}\ntest_dtc: 0.0\n"
        )
    stdout = _run(["tools/get_table_data.py",
                   *(str(p) for p in sorted(tmp_path.iterdir()))])
    assert "manipose" in stdout
    assert "0.72" in stdout  # the mean over the three seeds


def test_predict_cli_lifts_npz_video(tmp_path):
    """tools/predict.py end-to-end on a small random-weights model:
    windowing, static-batch padding, TTA, hypothesis dump, npz output."""
    import numpy as np

    rng = np.random.default_rng(0)
    np.savez(
        tmp_path / "kps.npz",
        clip_a=rng.normal(size=(40, 17, 2)).astype(np.float32),
        clip_b=rng.normal(size=(13, 17, 2)).astype(np.float32),
    )
    out = tmp_path / "poses.npz"
    stdout = _run([
        "tools/predict.py", "--input", str(tmp_path / "kps.npz"),
        "--output", str(out), "--batch-size", "2", "--hypotheses",
        "data.seq_len=9", "model.layers=2", "model.channels=32",
        "model.nheads=4", "model.layers_seg=2", "model.channels_seg=16",
        "model.nheads_seg=4", "multi_hyp.n_hyp=2",
    ])
    assert "lifted 2 video(s)" in stdout, stdout
    result = np.load(out)
    assert result["clip_a"].shape == (40, 17, 3)
    assert result["clip_b"].shape == (13, 17, 3)
    assert np.isfinite(result["clip_a"]).all()
    # rMCL default arch -> hypotheses dumped per window (ceil(40/9)=5)
    assert result["clip_a_hypotheses"].shape[0] == 5
    assert result["clip_a_scores"].shape[1] == 2  # n_hyp


@pytest.mark.slow
def test_mup_coord_check_runs():
    stdout = _run([
        "tools/mup_coord_check.py", "--widths", "32,64", "--steps", "2",
    ])
    assert "width" in stdout and "trunk|a|" in stdout, stdout


@pytest.mark.slow
def test_step_ablation_reports_marginals():
    stdout = _run([
        "tools/step_ablation.py", "--batch", "2", "--seq-len", "27",
        "--steps", "2", "--ablations", "full,no_seg,depth4,fwd",
        "--pack-group", "4",
    ])
    import json

    results = json.loads(stdout.strip().splitlines()[-1])
    assert set(results) == {"full", "no_seg", "depth4", "fwd"}
    for r in results.values():
        assert r["ms_per_step"] > 0
    assert "marginal_ms" in results["no_seg"]
    assert "marginal_ms" in results["depth4"]


def test_xla_copt_sweep_harness(tmp_path):
    """The compiler-option sweep harness must run a variant end-to-end
    (build via the production make_train_step + MANIPOSE_XLA_* env wire,
    time it, append a JSONL row). On CPU the options gate to None — the
    on-chip effect is BASELINE.md's; this covers the harness itself."""
    import json

    out = tmp_path / "sweep.jsonl"
    stdout = _run([
        "tools/xla_copt_sweep.py", "--small", "--iters", "1", "--reps", "1",
        "--only", "vmem32768-control", "--out", str(out),
    ])
    best = json.loads(stdout.strip().splitlines()[-1])["best"]
    assert best["variant"] == "vmem32768-control"
    assert best["status"] == "ok" and best["ms_per_step"] > 0
    rows = [json.loads(l) for l in out.read_text().splitlines()]
    assert len(rows) == 1 and rows[0]["variant"] == "vmem32768-control"


def test_make_synthetic_3dhp_roundtrip(tmp_path):
    """The FK-synthetic 3DHP archives must drive the production loader:
    MPI->H36M permute, root-centering, mm->m, valid masks, TS5/6 screen
    norms — and the poses must carry FK structure (constant bone
    lengths), which random fixtures cannot."""
    out = tmp_path / "synth_3dhp"
    stdout = _run([
        "tools/make_synthetic_3dhp.py", "--out", str(out),
        "--train-seqs", "2", "--cams", "2", "--frames", "60",
        "--test-frames", "50",
    ])
    assert "in-frame fraction=1.000" in stdout, stdout

    import numpy as np

    from manipose_tpu.data.dhp3 import Dataset3DHP

    train = Dataset3DHP(out, train=True)
    test = Dataset3DHP(out, train=False)
    assert len(train.poses) == 4  # 2 seqs x 2 cams
    assert len(test.poses) == 6  # TS1..TS6
    p = train.poses[0]
    assert p.shape == (60, 17, 3)
    np.testing.assert_allclose(p[:, 0], 0.0, atol=1e-6)  # root-centered
    # FK structure survives the on-disk roundtrip: constant bone lengths
    bones = np.asarray(train.skeleton.bones)
    lengths = np.linalg.norm(
        p[:, bones[:, 1]] - p[:, bones[:, 0]], axis=-1
    )
    assert lengths.std(axis=0).max() < 1e-5
    # valid-frame masking dropped some test frames (3 deterministic + 5%)
    assert all(q.shape[0] < 50 for q in test.poses)
    # screen normalization puts 2D in [-1, ~1]
    for q2 in (train.poses_2d[0], test.poses_2d[4]):  # TS5 is 1920x1080
        assert np.abs(q2).max() <= 1.0 + 1e-6


def test_robustness_sweep_cli(tmp_path):
    """The miss-pattern sweep evaluates the grid end-to-end and tables
    per-setting MPJPE (clean row first)."""
    import json

    import numpy as np

    rng = np.random.default_rng(0)
    data_dir = tmp_path / "h36m"
    data_dir.mkdir()
    subjects = ["S1", "S9", "S11"]
    actions = ["Walking"]
    n_frames = 40
    np.savez(
        data_dir / "data_3d_h36m.npz",
        positions_3d={
            s: {a: rng.normal(scale=0.3, size=(n_frames, 32, 3)).astype(
                np.float32) for a in actions}
            for s in subjects
        },
    )
    np.savez(
        data_dir / "data_2d_h36m_cpn_ft_h36m_dbb.npz",
        positions_2d={
            s: {a: [rng.uniform(0, 1000, size=(n_frames, 17, 2)).astype(
                np.float32) for _ in range(4)] for a in actions}
            for s in subjects
        },
    )

    out_csv = tmp_path / "sweep.csv"
    stdout = _run([
        "tools/robustness_sweep.py", "--miss-types", "random", "noisy",
        "--miss-rates", "0.2", "--noise-sigmas", "5", "15",
        "--out", str(out_csv),
        f"data.data_dir={data_dir}", "data.seq_len=9", "data.data=one",
        "data.actions=walking", "train.batch_size_test=4",
        "model.layers=2", "model.channels=32", "model.nheads=4",
        "model.layers_seg=2", "model.channels_seg=16",
        "model.nheads_seg=4", "multi_hyp.n_hyp=2",
    ])
    rows = [json.loads(line) for line in stdout.strip().splitlines()
            if line.startswith("{")]
    summary = rows[-1]
    settings = rows[:-1]
    assert [r["miss_type"] for r in settings] == [
        "no_miss", "random", "noisy", "noisy"
    ]
    # noisy sweeps noise_sigma (rate is meaningless for it, as in the
    # reference) — the two sigma settings must differ
    noisy = [r for r in settings if r["miss_type"] == "noisy"]
    assert [r["noise_sigma"] for r in noisy] == [5.0, 15.0]
    assert noisy[0]["mpjpe_mm"] != noisy[1]["mpjpe_mm"]
    assert all(np.isfinite(r["mpjpe_mm"]) for r in settings)
    assert all("oracle_mpjpe_mm" in r for r in settings)  # rMCL default
    assert summary["n_settings"] == 4
    assert out_csv.exists()
    header = out_csv.read_text().splitlines()[0]
    assert header.startswith("miss_type,miss_rate,noise_sigma,mpjpe_mm")


def test_robustness_sweep_cli_3dhp(tmp_path):
    """--dataset 3dhp runs the grid through the MPI-INF-3DHP test split
    and adds the protocol's PCK@150/AUC columns (oracle + aggregated
    for rMCL, as in the reference's main_3dhp.py:882-910)."""
    import json

    import numpy as np

    out = tmp_path / "synth_3dhp"
    _run([
        "tools/make_synthetic_3dhp.py", "--out", str(out),
        "--train-seqs", "1", "--cams", "1", "--frames", "40",
        "--test-frames", "40",
    ])
    stdout = _run([
        "tools/robustness_sweep.py", "--dataset", "3dhp",
        "--miss-types", "random", "--miss-rates", "0.3", "--",
        f"data.data_dir={out}", "data.seq_len=9",
        "train.batch_size_test=4", "model.layers=2", "model.channels=32",
        "model.nheads=4", "model.layers_seg=2", "model.channels_seg=16",
        "model.nheads_seg=4", "multi_hyp.n_hyp=2",
    ])
    rows = [json.loads(line) for line in stdout.strip().splitlines()
            if line.startswith("{")]
    settings = rows[:-1]
    assert [r["miss_type"] for r in settings] == ["no_miss", "random"]
    for r in settings:
        for key in ("pck", "auc", "agg_pck", "agg_auc"):
            assert np.isfinite(r[key]) and 0.0 <= r[key] <= 100.0
    assert rows[-1]["n_settings"] == 2


def test_streaming_eval_cli(tmp_path):
    """Streaming-accuracy study: offline anchor row + per-(lookahead,
    stride) streamed MPJPE over the 3DHP test split."""
    import json

    import numpy as np

    out = tmp_path / "synth_3dhp"
    _run([
        "tools/make_synthetic_3dhp.py", "--out", str(out),
        "--train-seqs", "1", "--cams", "1", "--frames", "40",
        "--test-frames", "40",
    ])
    csv_path = tmp_path / "stream.csv"
    stdout = _run([
        "tools/streaming_eval.py", "--dataset", "3dhp",
        "--lookaheads", "0", "4", "--strides", "3",
        "--out", str(csv_path), "--",
        f"data.data_dir={out}", "data.seq_len=9",
        "model.layers=2", "model.channels=32", "model.nheads=4",
        "model.layers_seg=2", "model.channels_seg=16",
        "model.nheads_seg=4", "multi_hyp.n_hyp=2",
    ])
    rows = [json.loads(line) for line in stdout.strip().splitlines()
            if line.startswith("{")]
    assert rows[0]["mode"] == "offline"
    streamed = rows[1:]
    assert [(r["lookahead"], r["stride"]) for r in streamed] == [
        (0, 3), (4, 3)]
    for r in rows:
        assert np.isfinite(r["mpjpe_mm"]) and r["mpjpe_mm"] > 0
    for r in streamed:
        assert r["latency_frames"] == r["lookahead"] + r["stride"] - 1
    assert csv_path.exists()
