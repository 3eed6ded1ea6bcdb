"""Evaluation engine: aggregation, TTA flip, oracle metrics.

Rebuild of ``hpe/eval_utils.py:16-253``. TPU-first layout: one jitted
eval step fuses forward pass (both TTA branches), hypothesis aggregation,
oracle/pseudo-oracle selection and masked error sums; the host loop only
accumulates scalars and stacks outputs. Padding rows of the final batch
are masked via ``valid`` (the reference instead ran a smaller last batch).

Known reference quirk (documented, fixed here): with ``tta=False`` the
reference divides the already joint-averaged oracle WTA values by J again
(``eval_utils.py:63-64``), under-reporting the non-TTA oracle MPJPE by a
factor of J; the TTA path (the default config) recomputes it correctly
(``eval_utils.py:108-116``). This build normalizes both paths correctly.
"""

from __future__ import annotations

import collections
import dataclasses
from typing import Callable, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.pipeline import prefetch
from ..utils.platform import tpu_compiler_options
from ..geometry.skeleton import Skeleton
from ..metrics.losses import wta_l2_loss_and_activate_head
from ..models.rmcl import aggregate_hypotheses, poses_from_hyp_idx


@dataclasses.dataclass(frozen=True)
class EvalConfig:
    tta: bool = True
    rmcl: bool = True
    compute_oracle: bool = True
    agg_mode: str = "weighted_ave"


def flip_poses(poses: jnp.ndarray, skeleton: Skeleton) -> jnp.ndarray:
    """On-device horizontal flip (functional form of
    ``augmentations/functional.py:7-28``): negate u/x, swap left/right."""
    perm = np.arange(skeleton.num_joints)
    left = np.asarray(skeleton.joints_left)
    right = np.asarray(skeleton.joints_right)
    perm[left] = right
    perm[right] = left
    flipped = poses[..., perm, :]
    return flipped.at[..., 0].multiply(-1.0)


# Bounded LRU of jitted eval steps. Keyed on (apply_fn, skeleton, cfg);
# bounded so long sweeps over many models/configs don't accumulate
# compiled executables (each holds device buffers via its jit cache).
_EVAL_STEP_CACHE: "collections.OrderedDict" = collections.OrderedDict()
_EVAL_STEP_CACHE_MAX = 8


def make_eval_step(
    apply_fn: Callable,
    skeleton: Skeleton,
    cfg: EvalConfig,
):
    """Build the jitted per-batch eval step.

    Returns step(params, pose_2d, pose_3d, valid) -> dict with:
      predictions (B, L, J, 3)      aggregated (weighted-ave) poses
      sum_jointerr                  sum over valid samples of per-joint errors
      n_valid                       number of valid sequences
      and under rmcl+oracle: oracle_preds, hypotheses, scores,
      oracle_sum_jointerr, psoracle_sum_jointerr (already /J as reference).
    """

    def _forward(params, x):
        return apply_fn(params, x, deterministic=True)

    def step(params, pose_2d, pose_3d, valid):
        out = {}
        j = pose_3d.shape[-2]
        mask = valid[:, None, None]  # over (B, L, J)

        if cfg.rmcl:
            hyps, scores = _forward(params, pose_2d)
            predictions = aggregate_hypotheses(hyps, scores, cfg.agg_mode)
            if cfg.compute_oracle:
                _, oracle_idx = wta_l2_loss_and_activate_head(hyps, pose_3d)
                oracle_preds = poses_from_hyp_idx(hyps, oracle_idx)
                psoracle_preds = aggregate_hypotheses(hyps, scores, "best_score")
        else:
            predictions = _forward(params, pose_2d)

        if cfg.tta:
            flipped_in = flip_poses(pose_2d, skeleton)
            if cfg.rmcl:
                hyps_f, scores_f = _forward(params, flipped_in)
                preds_f = aggregate_hypotheses(hyps_f, scores_f, cfg.agg_mode)
                if cfg.compute_oracle:
                    # flip hypotheses back, then re-select oracle/best-score
                    # (``eval_utils.py:93-136``)
                    hyps_fb = flip_poses(hyps_f, skeleton)
                    _, oracle_idx_f = wta_l2_loss_and_activate_head(
                        hyps_fb, pose_3d
                    )
                    oracle_preds = (
                        oracle_preds + poses_from_hyp_idx(hyps_fb, oracle_idx_f)
                    ) / 2
                    psoracle_preds = (
                        psoracle_preds
                        + aggregate_hypotheses(hyps_fb, scores_f, "best_score")
                    ) / 2
            else:
                preds_f = _forward(params, flipped_in)
            predictions = (predictions + flip_poses(preds_f, skeleton)) / 2

        def masked_jointerr_sum(pred):
            err = jnp.linalg.norm(pred - pose_3d, axis=-1)  # (B, L, J)
            return jnp.sum(err * mask)

        out["predictions"] = predictions
        out["sum_jointerr"] = masked_jointerr_sum(predictions)
        out["n_valid"] = jnp.sum(valid)
        if cfg.rmcl:
            out["hypotheses"] = hyps
            out["scores"] = scores
        if cfg.rmcl and cfg.compute_oracle:
            out["oracle_preds"] = oracle_preds
            out["oracle_sum_jointerr"] = masked_jointerr_sum(oracle_preds) / j
            out["psoracle_sum_jointerr"] = masked_jointerr_sum(psoracle_preds) / j
        return out

    # same graph class as the serving forward, where the scoped-VMEM
    # budget measured +1.5% on-chip (BASELINE.md r3 compiler sweep)
    return jax.jit(step, compiler_options=tpu_compiler_options())


def evaluate(
    apply_fn: Callable,
    params,
    loader: Iterable,
    skeleton: Skeleton,
    cfg: EvalConfig,
    return_hyps: bool = False,
):
    """Host loop over a loader; mirrors ``eval_utils.evaluate``.

    Returns (all_predictions_mm, all_targets, performance_mm) and, when
    oracle metrics are on, additionally (oracle_mpjpe_mm,
    psoracle_mpjpe_mm, all_oracle_preds_mm). Predictions are in mm
    (``eval_utils.py:206-223`` scales by 1000); targets stay in meters.
    When ``return_hyps`` is set, predictions are the per-hypothesis poses
    (mm) concatenated with scores (``eval_utils.py:155-160``).
    """
    # memoize the jitted step: the drivers call evaluate() repeatedly
    # (per action / per eval epoch) with the same (apply_fn, skeleton,
    # cfg) — rebuilding the closure would force a recompile each time
    cache_key = (apply_fn, skeleton, cfg)
    step = _EVAL_STEP_CACHE.get(cache_key)
    if step is None:
        step = make_eval_step(apply_fn, skeleton, cfg)
        _EVAL_STEP_CACHE[cache_key] = step
        while len(_EVAL_STEP_CACHE) > _EVAL_STEP_CACHE_MAX:
            # dropping the jit wrapper releases its compiled executables
            _EVAL_STEP_CACHE.popitem(last=False)
    else:
        _EVAL_STEP_CACHE.move_to_end(cache_key)
    all_preds, all_targets, all_oracle = [], [], []
    sum_err = 0.0
    oracle_sum = 0.0
    psoracle_sum = 0.0
    n = 0.0
    seq_len = joints = None
    compute_oracle = cfg.rmcl and cfg.compute_oracle

    def harvest(out, batch):
        """Pull one dispatched step's outputs to host (forces its
        completion) and accumulate."""
        nonlocal sum_err, oracle_sum, psoracle_sum, n, seq_len, joints
        n_b = int(batch.valid.sum())
        seq_len, joints = batch.pose_3d.shape[1:3]
        sum_err += float(out["sum_jointerr"])
        n += n_b
        keep = slice(0, n_b)  # drop padding rows on host
        if return_hyps and cfg.rmcl:
            hyps = np.asarray(out["hypotheses"][keep]) * 1000.0
            scores = np.broadcast_to(
                np.asarray(out["scores"][keep])[:, :, :, None, :],
                hyps.shape[:-1] + (1,),
            )
            all_preds.append(np.concatenate([hyps, scores], axis=-1))
        else:
            all_preds.append(np.asarray(out["predictions"][keep]) * 1000.0)
        all_targets.append(np.asarray(batch.pose_3d[keep]))
        if compute_oracle:
            oracle_sum += float(out["oracle_sum_jointerr"])
            psoracle_sum += float(out["psoracle_sum_jointerr"])
            all_oracle.append(np.asarray(out["oracle_preds"][keep]) * 1000.0)

    # depth-1 software pipeline: dispatch batch i+1 BEFORE harvesting
    # batch i, so the device computes while the host pulls/accumulates
    # the previous outputs (harvest's float()/asarray are per-batch
    # completion barriers — issuing them eagerly would serialize host
    # and device); prefetch() overlaps host window assembly on top.
    pending = None
    for batch in prefetch(loader):
        out = step(
            params,
            jnp.asarray(batch.pose_2d),
            jnp.asarray(batch.pose_3d),
            jnp.asarray(batch.valid),
        )
        if pending is not None:
            harvest(*pending)
        pending = (out, batch)
    if pending is not None:
        harvest(*pending)

    assert n > 0 and seq_len is not None, (
        "evaluate() received an empty loader (no windows: check seq_len vs "
        "video lengths and the subject/action filters)"
    )
    performance = sum_err / (n * seq_len * joints) * 1000.0
    if not compute_oracle:
        return all_preds, all_targets, performance
    oracle_mpjpe = oracle_sum / (n * seq_len) * 1000.0
    psoracle_mpjpe = psoracle_sum / (n * seq_len) * 1000.0
    return (
        all_preds,
        all_targets,
        performance,
        oracle_mpjpe,
        psoracle_mpjpe,
        all_oracle,
    )
