"""End-to-end 3DHP driver smoke test on a synthetic dataset."""

import numpy as np
import pytest

from manipose_tpu.config import load_config


@pytest.fixture(scope="module")
def synthetic_3dhp(tmp_path_factory):
    data_dir = tmp_path_factory.mktemp("dhp3")
    rng = np.random.default_rng(0)
    n_frames = 40

    # train archive: data[seq][0][cam] = {data_3d (N,17,3) mm, data_2d (N,17,2)}
    train = {
        "S1 Seq1": {
            0: {
                cam: {
                    "data_3d": rng.normal(
                        scale=300, size=(n_frames, 17, 3)
                    ).astype(np.float32),
                    "data_2d": rng.uniform(
                        0, 2048, size=(n_frames, 17, 2)
                    ).astype(np.float32),
                }
                for cam in ("0", "1")
            }
        }
    }
    np.savez(data_dir / "data_train_3dhp.npz", data=train)

    # test archive: data[seq] = {valid, data_3d, data_2d}
    test = {}
    for seq, wh in [("TS1", 2048), ("TS5", 1920)]:
        valid = np.ones(n_frames)
        valid[:5] = 0  # some invalid frames
        test[seq] = {
            "valid": valid,
            "data_3d": rng.normal(scale=300, size=(n_frames, 17, 3)).astype(
                np.float32
            ),
            "data_2d": rng.uniform(0, wh, size=(n_frames, 17, 2)).astype(
                np.float32
            ),
        }
    np.savez(data_dir / "data_test_3dhp.npz", data=test)
    return data_dir


class TestDataset3DHP:
    def test_prepare_train(self, synthetic_3dhp):
        from manipose_tpu.data.dhp3 import Dataset3DHP

        ds = Dataset3DHP(synthetic_3dhp, train=True)
        assert len(ds.poses) == 2  # 2 cameras
        p3 = ds.poses[0]
        assert p3.shape == (40, 17, 3)
        # root-centered at the hip (H36M index 0 == MPI joint 14)
        np.testing.assert_allclose(p3[:, 0], 0.0, atol=1e-6)
        # meters scale
        assert np.abs(p3).max() < 5.0
        # 2D normalized to ~[-1, 1]
        assert np.abs(ds.poses_2d[0]).max() <= 1.5

    def test_prepare_test_masks_invalid(self, synthetic_3dhp):
        from manipose_tpu.data.dhp3 import Dataset3DHP

        ds = Dataset3DHP(synthetic_3dhp, train=False)
        assert len(ds.poses) == 2
        assert ds.poses[0].shape[0] == 35  # 5 invalid frames dropped

    def test_skeleton_matches_h36m17_topology(self):
        from manipose_tpu.data.dhp3 import dhp3_skeleton
        from manipose_tpu.geometry import h36m_skeleton_17

        a, b = dhp3_skeleton(), h36m_skeleton_17()
        assert a.parents == b.parents
        assert a.bones == b.bones
        assert a.joints_left == b.joints_left


def cfg_overrides(data_dir, out_dir):
    return [
        "data=mpi_inf_3dhp",
        f"data.data_dir={data_dir}",
        f"run.output_dir={out_dir}",
        "data.seq_len=9",
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
    ]


class TestDHP3Driver:
    def test_full_debug_run(self, synthetic_3dhp, tmp_path):
        from manipose_tpu.drivers.dhp3 import main

        cfg = load_config(
            "config", overrides=cfg_overrides(synthetic_3dhp, tmp_path)
        )
        best = main(cfg)
        assert best is not None and np.isfinite(best)
        out = tmp_path / "default"
        for artifact in ["seg_symmetry.csv", "seg_consistency.csv",
                         "jw_err.csv", "cw_err.csv"]:
            assert (out / artifact).exists(), artifact

        # eval-only from OUR OWN trained best-tag checkpoint
        # (run.checkpoint_params + run.train=false) reproduces the
        # train run's test protocol exactly
        import csv as _csv

        cfg2 = load_config(
            "config",
            overrides=cfg_overrides(synthetic_3dhp, tmp_path) + [
                "run.train=false",
                "run.experiment=evalonly",
                f"run.checkpoint_params={out / 'best_mpjpe'}",
            ],
        )
        assert main(cfg2) is None  # no training happened

        def read_metrics(path):
            with open(path) as f:
                return list(_csv.DictReader(f))[0]

        trained = read_metrics(out / "test_metrics.csv")
        evalonly = read_metrics(tmp_path / "evalonly" / "test_metrics.csv")
        for key in ["pck", "auc", "agg_pck", "agg_auc", "best_val_mpjpe"]:
            assert np.isclose(
                float(evalonly[key]), float(trained[key]), rtol=1e-6
            ), key

    def test_eval_only_metrics(self, synthetic_3dhp, tmp_path):
        from manipose_tpu.data.dhp3 import Dataset3DHP
        from manipose_tpu.drivers.dhp3 import run_test_protocol
        from manipose_tpu.drivers.common import (
            init_model_params,
            instantiate_model,
        )

        cfg = load_config(
            "config",
            overrides=[
                "data=mpi_inf_3dhp",
                f"data.data_dir={synthetic_3dhp}",
                "data.seq_len=9",
                "model.layers=2", "model.channels=32", "model.nheads=4",
                "model.layers_seg=2", "model.channels_seg=16",
                "model.nheads_seg=4", "multi_hyp.n_hyp=2",
                "train.batch_size_test=4",
            ],
        )
        dataset = Dataset3DHP(synthetic_3dhp, train=False)
        model, rmcl = instantiate_model(cfg, dataset.skeleton)
        params = init_model_params(model, cfg, 17)
        metrics = run_test_protocol(
            model.apply, params, cfg, dataset, rmcl, tmp_path
        )
        for key in ["best_val_mpjpe", "sag_sym", "seg_std", "pck", "auc",
                    "agg_pck", "agg_auc", "best_val_oracle_mpjpe"]:
            assert key in metrics and np.isfinite(metrics[key]), key
        assert 0 <= metrics["pck"] <= 100
        assert 0 <= metrics["auc"] <= 100
        # eval-only runs must persist the headline metrics themselves
        # (reference writes its own PCK/AUC CSV, main_3dhp.py:931-988)
        csv_path = tmp_path / "test_metrics.csv"
        assert csv_path.exists()
        import csv as _csv

        with open(csv_path) as f:
            rows = list(_csv.DictReader(f))
        assert len(rows) == 1
        for key in ["pck", "auc", "agg_pck", "agg_auc", "best_val_mpjpe"]:
            assert np.isclose(float(rows[0][key]), metrics[key]), key
