"""Composite training loss assembly.

Rebuild of ``make_loss`` / ``compute_and_acc_loss``
(``hpe/main_h36m_lifting.py:101-209``) as a pure function returning both
the scalar total and a dict of per-term values for logging — no Python
closures over mutable counters, so the whole thing jits.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax.numpy as jnp

from ..metrics.losses import (
    STANDARD_H36M_WEIGHTS,
    binary_cross_entropy,
    mean_velocity_error,
    weighted_mpjpe_loss,
    weighted_mse_loss,
    wta_l2_loss_and_activate_head,
)
from ..metrics.consistency import (
    segments_time_consistency,
    smoothness_regularization,
)
from ..geometry.skeleton import Skeleton


@dataclasses.dataclass(frozen=True)
class LossConfig:
    """Mirrors the ``train`` config group knobs consumed by ``make_loss``
    (``hpe/conf/config.yaml:32-38``)."""

    sq_loss: bool = False
    w_loss: bool = True
    vel_loss: float = 2.0
    smooth_reg: float = 0.5
    rmcl_score_reg: float = 0.1
    rigid_seg_reg: float = 0.0
    rmcl: bool = True  # model emits (hypotheses, scores)


def compute_loss(
    prediction,
    target: jnp.ndarray,
    cfg: LossConfig,
    skeleton: Optional[Skeleton] = None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """-> (total loss, per-term dict).

    ``prediction`` is (B, L, J, 3) for single-hypothesis models, or the
    tuple (poses (B, H, L, J, 3), scores (B, H, L, 1)) for rMCL.
    Term semantics follow ``main_h36m_lifting.py:101-178``:
    - wloss: weighted MPJPE/MSE, or its WTA form over hypotheses
    - score_reg: beta-weighted BCE on plausibility scores (rMCL only)
    - vloss: velocity error (time axis 2 for rMCL, 1 otherwise)
    - sreg: smoothness regularization on the prediction
    - rigid_seg_reg: segment-length temporal-consistency penalty
    """
    weights = STANDARD_H36M_WEIGHTS if cfg.w_loss else None
    terms: Dict[str, jnp.ndarray] = {}

    if cfg.rmcl:
        poses, scores = prediction
        time_axis = 2
        # one WTA computation feeds both terms (the reference recomputes
        # it inside wta_with_scoring_loss; identical math)
        unagg_wta, active_idx = wta_l2_loss_and_activate_head(
            hypothesis=poses, y=target, weights=weights, squared=cfg.sq_loss
        )
        terms["wloss"] = jnp.mean(unagg_wta)
        if cfg.rmcl_score_reg > 0:
            n_hyp = poses.shape[1]
            gt_scores = jnp.transpose(
                jnp.eye(n_hyp, dtype=scores.dtype)[active_idx], (0, 2, 1)
            )
            terms["score_reg"] = cfg.rmcl_score_reg * binary_cross_entropy(
                scores[..., 0], gt_scores
            )
        pred_for_reg = poses
    else:
        poses = prediction
        time_axis = 1
        loss_fn = weighted_mse_loss if cfg.sq_loss else weighted_mpjpe_loss
        terms["wloss"] = loss_fn(poses, target, weights=weights)
        pred_for_reg = poses

    if cfg.vel_loss > 0:
        terms["vloss"] = cfg.vel_loss * mean_velocity_error(
            predicted=pred_for_reg,
            target=target,
            squared=cfg.sq_loss,
            axis=time_axis,
        )
    if cfg.smooth_reg > 0:
        terms["sreg"] = cfg.smooth_reg * smoothness_regularization(
            prediction=pred_for_reg, weights=weights, axis=time_axis
        )
    if cfg.rigid_seg_reg > 0:
        assert skeleton is not None
        terms["rigid_seg_reg"] = cfg.rigid_seg_reg * segments_time_consistency(
            pred_for_reg, skeleton=skeleton, mode="sum"
        )

    total = jnp.asarray(0.0, jnp.float32)
    for v in terms.values():
        total = total + v
    return total, terms
