"""MPI-INF-3DHP experiment driver: train + PCK/AUC test protocol.

Rebuild of ``hpe/main_3dhp.py:662-1059``. Semantics kept:
- with rMCL, the headline PCK/AUC are computed on the *oracle* poses and
  ``agg_pck``/``agg_auc`` on the score-aggregated ones
  (``main_3dhp.py:882-910``);
- the scalar MPSCE flattens all eval windows into one long sequence while
  the per-bone MPSCE stays per-window (reference inconsistency,
  ``main_3dhp.py:843-858`` vs ``:869-878``).
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..data import PoseSequenceDataset, SequenceLoader
from ..data.dhp3 import Dataset3DHP
from ..eval.engine import EvalConfig, evaluate
from ..metrics import (
    coordwise_error,
    jointwise_error,
    keypoint_3d_auc,
    keypoint_3d_pck,
    sagittal_symmetry,
    sagittal_symmetry_per_bone,
    segments_time_consistency,
    segments_time_consistency_per_bone,
)
from ..train.checkpoint import load_torch_checkpoint
from ..train.loop import train as train_loop
from ..utils.logging import MetricLogger, save_csv_log
from .common import (
    init_model_params,
    instantiate_model,
    maybe_restore_eval_params,
)


def create_loader(dataset: Dataset3DHP, cfg: Config, train: bool = True):
    """(``main_3dhp.py:530-561``)"""
    ds = PoseSequenceDataset(
        dataset.poses,
        dataset.poses_2d,
        None,
        seq_len=cfg.data.seq_len,
        random_start=train,
        miss_type=cfg.data.miss_type,
        miss_rate=cfg.data.miss_rate,
        noise_sigma=cfg.data.noise_sigma,
        skeleton=dataset.skeleton,
        flip_probability=0.5 if (train and cfg.train.flip_aug) else 0.0,
    )
    return SequenceLoader(
        ds,
        batch_size=cfg.train.batch_size if train else cfg.train.batch_size_test,
        shuffle=train,
        seed=cfg.run.seed,
    )


def run_test_protocol(
    apply_fn,
    params,
    cfg: Config,
    dataset: Dataset3DHP,
    rmcl: bool,
    output_dir,
    logger: Optional[MetricLogger] = None,
):
    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    skeleton = dataset.skeleton
    logger = logger or MetricLogger()
    loader = create_loader(dataset, cfg, train=False)
    eval_cfg = EvalConfig(tta=cfg.train.tta, rmcl=rmcl, compute_oracle=rmcl)

    results = evaluate(apply_fn, params, loader, skeleton, eval_cfg)
    metrics = {}
    if rmcl:
        agg_preds, targets, mpjpe, o_mpjpe, pso_mpjpe, oracle_preds = results
        generated = np.concatenate(oracle_preds, axis=0)  # mm
        aggregated = np.concatenate(agg_preds, axis=0)  # mm
        metrics["best_val_oracle_mpjpe"] = o_mpjpe
        metrics["best_val_ps_oracle_mpjpe"] = pso_mpjpe
    else:
        preds, targets, mpjpe = results
        generated = np.concatenate(preds, axis=0)
        aggregated = None
    target_mm = np.concatenate(targets, axis=0) * 1000.0
    metrics["best_val_mpjpe"] = mpjpe

    gen = jnp.asarray(generated)
    tgt = jnp.asarray(target_mm)
    n_seq, seq_len, j, _ = generated.shape
    gen_flat_time = gen.reshape(1, n_seq * seq_len, j, 3)

    metrics["sag_sym"] = float(
        sagittal_symmetry(gen, skeleton, mode="average", squared=False)
    )
    metrics["seg_std"] = float(
        segments_time_consistency(gen_flat_time, skeleton, mode="std")
    )
    metrics["pck"] = float(
        keypoint_3d_pck(gen.reshape(-1, j, 3), tgt.reshape(-1, j, 3),
                        mask=None, threshold=150.0)
    )
    metrics["auc"] = float(
        keypoint_3d_auc(gen.reshape(-1, j, 3), tgt.reshape(-1, j, 3), mask=None)
    )
    if rmcl:
        agg = jnp.asarray(aggregated)
        metrics["agg_pck"] = float(
            keypoint_3d_pck(agg.reshape(-1, j, 3), tgt.reshape(-1, j, 3),
                            mask=None, threshold=150.0)
        )
        metrics["agg_auc"] = float(
            keypoint_3d_auc(agg.reshape(-1, j, 3), tgt.reshape(-1, j, 3),
                            mask=None)
        )

    # analytics CSVs (``main_3dhp.py:769-792,826-878,988``)
    analytics = {}
    bw_sym = np.asarray(
        sagittal_symmetry_per_bone(gen, skeleton, "average", squared=False)
    )
    seg_symmetry = np.zeros([1, skeleton.num_bones])
    seg_symmetry[0, list(skeleton.bones_left)] = bw_sym
    seg_symmetry[0, list(skeleton.bones_right)] = bw_sym
    analytics["seg_symmetry"] = (seg_symmetry, list(skeleton.bones_names))
    analytics["seg_consistency"] = (
        np.asarray(
            segments_time_consistency_per_bone(gen, skeleton, "std")
        )[None],
        list(skeleton.bones_names),
    )
    analytics["jw_err"] = (
        np.asarray(jointwise_error(gen, tgt, "average"))[None],
        list(skeleton.joints_names),
    )
    analytics["cw_err"] = (
        np.asarray(coordwise_error(gen, tgt, "average"))[None],
        ["x", "y", "z"],
    )
    for name, (values, head) in analytics.items():
        save_csv_log(output_dir, head, values.astype(str), is_create=True,
                     file_name=name)
    logger.log(metrics, step=0)
    # Persist + print the headline metrics (PCK/AUC, MPSSE, MPSCE, ...)
    # themselves: the reference writes them to their own CSV at the end of
    # its test block (``main_3dhp.py:931-988``). Without this, an
    # eval-only run (run.train=false) would leave no record of its result
    # (the train path's metrics.csv is never written then).
    head = list(metrics.keys())
    save_csv_log(
        output_dir,
        head,
        np.asarray([[repr(float(metrics[k])) for k in head]]),
        is_create=True,
        file_name="test_metrics",
    )
    print("==> 3DHP test metrics:")
    for k in head:
        print(f"    {k}: {float(metrics[k]):.4f}")
    return metrics


def main(cfg: Config) -> Optional[float]:
    from ..utils.compile_cache import enable_compilation_cache
    from .common import wants_cpu_collectives

    enable_compilation_cache(cpu_collectives=wants_cpu_collectives(cfg))
    print("==> Using settings:")
    print(cfg.to_yaml())
    assert cfg.data.dataset == "3dhp", (
        "use data=mpi_inf_3dhp group for the 3DHP driver"
    )
    output_dir = Path(cfg.run.output_dir) / cfg.run.experiment
    output_dir.mkdir(parents=True, exist_ok=True)

    dataset_train = Dataset3DHP(cfg.data.data_dir, train=True) if cfg.run.train else None
    dataset_test = Dataset3DHP(cfg.data.data_dir, train=False) if cfg.run.test else None
    skeleton = (dataset_test or dataset_train).skeleton

    model, rmcl = instantiate_model(cfg, skeleton)
    from ..parallel.flagship import maybe_pipelined_apply

    apply_fn = maybe_pipelined_apply(model, cfg)
    if cfg.run.checkpoint_model:
        variables = load_torch_checkpoint(cfg.run.checkpoint_model, cfg.model.arch)
        variables = jax.tree_util.tree_map(jnp.asarray, variables)
    else:
        variables = init_model_params(model, cfg, skeleton.num_joints)
        variables = maybe_restore_eval_params(variables, cfg)

    logger = MetricLogger(
        mlflow_on=cfg.run.mlflow_on, experiment=cfg.run.experiment
    )
    best_valid_mpjpe = None
    if cfg.run.train:
        train_loader = create_loader(dataset_train, cfg, train=True)
        valid_loader = create_loader(
            dataset_test
            if dataset_test is not None
            else Dataset3DHP(cfg.data.data_dir, train=False),
            cfg,
            train=False,
        )
        result = train_loop(
            apply_fn, variables, cfg, skeleton, train_loader, valid_loader,
            output_dir, rmcl=rmcl, logger=logger,
        )
        best_valid_mpjpe = result.best_mpjpe
        variables = result.best_params
        logger.save_csv(output_dir)

    if cfg.run.test:
        run_test_protocol(
            apply_fn, variables, cfg, dataset_test, rmcl, output_dir,
            logger=logger,
        )
    return best_valid_mpjpe
