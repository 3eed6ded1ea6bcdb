"""Human3.6M experiment driver: train + per-action test protocol.

Rebuild of ``hpe/main_h36m_lifting.py:711-1266``. The test protocol
computes, per action and averaged: MPJPE, MPSSE (sagittal symmetry),
MPSCE (segment std), P-MPJPE, MVJPE, MSE, error variance, segment-length
error, and (rMCL) oracle / pseudo-oracle MPJPE, plus per-bone/joint/coord
analytics CSVs — all in mm.

Reference quirk kept behind config: the reference tests on S11 only
(``main_h36m_lifting.py:890-891``), not TEST_SUBJECTS; default here
matches (``run.test_subjects: [S11]``) so numbers are comparable.
"""

from __future__ import annotations

import pickle
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..data import Human36mDataset, create_2d_data, read_3d_data
from ..eval.engine import EvalConfig, evaluate
from ..metrics import (
    coordwise_error,
    jointwise_error,
    jointwise_mse,
    mean_velocity_error,
    mse_error,
    p_mpjpe,
    sagittal_symmetry,
    sagittal_symmetry_per_bone,
    segments_len_err,
    segments_max_diff_stretch_per_bone,
    segments_max_stretch_per_bone,
    segments_time_consistency,
    segments_time_consistency_per_bone,
)
from ..train.checkpoint import load_torch_checkpoint
from ..train.loop import train as train_loop
from ..utils.logging import MetricLogger, save_csv_log
from .common import (
    create_loader,
    get_subjects_and_actions,
    init_model_params,
    instantiate_model,
    maybe_restore_eval_params,
)

ALL_TEST_ACTIONS = [
    "walking", "eating", "smoking", "discussion", "directions", "greeting",
    "phoning", "posing", "purchases", "sitting", "sittingdown", "photo",
    "waiting", "walkdog", "walktogether",
]


def fetch_and_prepare_data(cfg: Config):
    """npz -> Human36mDataset + normalized 2D keypoints, with a pickle
    cache of the preprocessed 3D data (``main_h36m_lifting.py:511-540``)."""
    data_dir = Path(cfg.data.data_dir)
    cache = data_dir / (
        f"preproc_data_3d_{cfg.data.dataset}_{cfg.data.joints}_manipose_tpu.pkl"
    )
    if cache.exists():
        with open(cache, "rb") as f:
            dataset = pickle.load(f)
    else:
        dataset = Human36mDataset(
            data_dir / f"data_3d_{cfg.data.dataset}.npz",
            n_joints=cfg.data.joints,
        )
        dataset = read_3d_data(dataset)
        try:
            with open(cache, "wb") as f:
                pickle.dump(dataset, f)
        except OSError:
            pass
    keypoints = create_2d_data(
        data_dir / f"data_2d_{cfg.data.dataset}_{cfg.data.keypoints}.npz",
        dataset,
    )
    return keypoints, dataset


def run_test_protocol(
    apply_fn,
    params,
    cfg: Config,
    dataset,
    keypoints,
    rmcl: bool,
    output_dir,
    actions: Optional[list] = None,
    logger: Optional[MetricLogger] = None,
):
    """Per-action test table (``main_h36m_lifting.py:820-1195``)."""
    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    skeleton = dataset.skeleton
    logger = logger or MetricLogger()
    if actions is None:
        actions = list(ALL_TEST_ACTIONS)
    test_subjects = list(cfg.run.get("test_subjects", ["S11"]))

    head = ["act", "mpjpe", "sag sym", "seg std", "p-mpjpe", "mvjpe", "mse",
            "err var", "seg err"]
    n_cols = 8
    if rmcl:
        head += ["oracle mpjpe", "pseudo oracle mpjpe"]
        n_cols = 10
    errs = np.zeros([len(actions) + 1, n_cols])

    analytics = {
        k: (
            np.zeros([len(actions) + 1, skeleton.num_bones]),
            ["act", *skeleton.bones_names],
        )
        for k in ["seg_symmetry", "seg_consistency", "seg_max_strech",
                  "seg_max_delta_strech"]
    }
    analytics["cw_err"] = (np.zeros([len(actions) + 1, 3]), ["act", "x", "y", "z"])
    analytics["jw_err"] = (
        np.zeros([len(actions) + 1, skeleton.num_joints]),
        ["act", *skeleton.joints_names],
    )
    all_seg_errs, all_jw_err_var, all_pred_hyps = [], [], []
    eval_cfg = EvalConfig(tta=cfg.train.tta, rmcl=rmcl, compute_oracle=rmcl)
    rng = np.random.default_rng(cfg.run.seed)

    for i, action in enumerate(actions):
        print(f"Assessing action: {action} - [{i + 1}/{len(actions)}]")
        loader = create_loader(
            keypoints, dataset, [action], test_subjects, cfg, train=False
        )
        results = evaluate(
            apply_fn, params, loader, skeleton, eval_cfg,
            return_hyps=bool(cfg.viz.hypothesis) and rmcl,
        )
        if rmcl:
            preds, targets, mpjpe, o_mpjpe, pso_mpjpe, oracle_preds = results
            errs[i, 8] = o_mpjpe
            errs[i, 9] = pso_mpjpe
            generated = np.concatenate(oracle_preds, axis=0)  # mm, (N,L,J,3)
            all_pred_hyps.append((np.concatenate(preds, axis=0), targets))
        else:
            preds, targets, mpjpe = results
            generated = np.concatenate(preds, axis=0)
        errs[i, 0] = mpjpe
        target_mm = np.concatenate(targets, axis=0) * 1000.0

        gen = jnp.asarray(generated)
        tgt = jnp.asarray(target_mm)
        n_seq, seq_len, j, _ = generated.shape
        # one long sequence for temporal consistency (``:949-960``)
        gen_flat_time = gen.reshape(1, n_seq * seq_len, j, 3)

        errs[i, 1] = float(
            sagittal_symmetry(gen, skeleton, mode="average", squared=False)
        )
        errs[i, 2] = float(
            segments_time_consistency(gen_flat_time, skeleton, mode="std")
        )
        errs[i, 3] = float(p_mpjpe(gen, tgt))
        errs[i, 4] = float(
            mean_velocity_error(gen, tgt, squared=False, axis=1)
        )
        mse = float(mse_error(gen, tgt, "average"))
        errs[i, 5] = mse
        errs[i, 6] = mse - float(mpjpe) ** 2
        errs[i, 7] = float(
            segments_len_err(gen, tgt, skeleton, mode="average", signed=False)
        )

        seg_errs = np.asarray(
            segments_len_err(gen, tgt, skeleton, mode="no_agg")
        )
        rand_idx = rng.integers(0, max(seg_errs.shape[0] - 1, 1), size=1000)
        all_seg_errs.append(seg_errs[rand_idx])

        bw_sym = np.asarray(
            sagittal_symmetry_per_bone(gen, skeleton, "average", squared=False)
        )
        analytics["seg_symmetry"][0][i, list(skeleton.bones_left)] = bw_sym
        analytics["seg_symmetry"][0][i, list(skeleton.bones_right)] = bw_sym
        analytics["seg_consistency"][0][i] = np.asarray(
            segments_time_consistency_per_bone(gen_flat_time, skeleton, "std")
        )
        analytics["jw_err"][0][i] = np.asarray(jointwise_error(gen, tgt, "average"))
        analytics["cw_err"][0][i] = np.asarray(coordwise_error(gen, tgt, "average"))
        jw_mse = np.asarray(jointwise_mse(gen, tgt, "average"))
        all_jw_err_var.append(jw_mse - analytics["jw_err"][0][i] ** 2)
        lo, hi = segments_max_stretch_per_bone(gen_flat_time, skeleton)
        analytics["seg_max_strech"][0][i] = np.asarray(hi) - np.asarray(lo)
        max_delta, _ = segments_max_diff_stretch_per_bone(gen_flat_time, skeleton)
        analytics["seg_max_delta_strech"][0][i] = np.asarray(max_delta)

    errs[-1] = np.mean(errs[:-1], axis=0)
    logger.log(
        {
            "best_val_mpjpe": errs[-1, 0],
            "sag_sym": errs[-1, 1],
            "seg_std": errs[-1, 2],
            "val_pmpjpe": errs[-1, 3],
            "val_mvjpe": errs[-1, 4],
            "val_mse": errs[-1, 5],
            "val_err_var": errs[-1, 6],
            "val_mean_seg_err": errs[-1, 7],
            **(
                {
                    "best_val_oracle_mpjpe": errs[-1, 8],
                    "best_val_ps_oracle_mpjpe": errs[-1, 9],
                }
                if rmcl
                else {}
            ),
        },
        step=0,
    )

    action_col = np.array(list(actions) + ["average"])[:, None]
    save_csv_log(
        output_dir,
        head,
        np.hstack([action_col, errs.astype(str)]),
        is_create=True,
        file_name="protocol_1_err",
    )
    for metric_name, (values, a_head) in analytics.items():
        values[-1] = np.mean(values[:-1], axis=0)
        save_csv_log(
            output_dir,
            a_head,
            np.hstack([action_col, values.astype(str)]),
            is_create=True,
            file_name=metric_name,
        )
    np.save(output_dir / "all_seg_errs.npy", np.concatenate(all_seg_errs, axis=0))
    np.save(output_dir / "all_jw_err_var.npy", np.stack(all_jw_err_var, axis=0))
    if all_pred_hyps:
        with open(output_dir / "all_pred_hyps.pkl", "wb") as f:
            pickle.dump(all_pred_hyps, f)
    return errs, head


def main(cfg: Config) -> Optional[float]:
    """Full driver (``main_h36m_lifting.py:711-1266``)."""
    from ..utils.compile_cache import enable_compilation_cache
    from .common import wants_cpu_collectives

    enable_compilation_cache(cpu_collectives=wants_cpu_collectives(cfg))
    print("==> Using settings:")
    print(cfg.to_yaml())

    output_dir = Path(cfg.run.output_dir) / cfg.run.experiment
    output_dir.mkdir(parents=True, exist_ok=True)

    keypoints, dataset = fetch_and_prepare_data(cfg)
    subjects_split, actions = get_subjects_and_actions(dataset, cfg)
    subjects_train, subjects_val, subjects_test = subjects_split

    model, rmcl = instantiate_model(cfg, dataset.skeleton)
    # parallel.pipe > 1 swaps in the GPipe-staged trunk apply
    from ..parallel.flagship import maybe_pipelined_apply

    apply_fn = maybe_pipelined_apply(model, cfg)
    if cfg.run.checkpoint_model:
        variables = load_torch_checkpoint(cfg.run.checkpoint_model, cfg.model.arch)
        variables = jax.tree_util.tree_map(jnp.asarray, variables)
    else:
        variables = init_model_params(model, cfg, dataset.skeleton.num_joints)
        variables = maybe_restore_eval_params(variables, cfg)

    logger = MetricLogger(
        mlflow_on=cfg.run.mlflow_on, experiment=cfg.run.experiment
    )
    best_valid_mpjpe = None

    if cfg.run.train:
        train_loader = create_loader(
            keypoints, dataset, actions, subjects_train, cfg, train=True
        )
        valid_loader = create_loader(
            keypoints,
            dataset,
            actions,
            subjects_val if cfg.data.use_valid else subjects_test,
            cfg,
            train=False,
        )
        result = train_loop(
            apply_fn,
            variables,
            cfg,
            dataset.skeleton,
            train_loader,
            valid_loader,
            output_dir,
            rmcl=rmcl,
            logger=logger,
        )
        best_valid_mpjpe = result.best_mpjpe
        variables = result.best_params
        logger.save_csv(output_dir)

    if cfg.run.test:
        run_test_protocol(
            apply_fn,
            variables,
            cfg,
            dataset,
            keypoints,
            rmcl,
            output_dir,
            actions=actions,
            logger=logger,
        )

    if cfg.run.viz:
        from ..viz.driver import render_from_config

        render_from_config(cfg, apply_fn, variables, dataset, keypoints, rmcl)

    return best_valid_mpjpe
