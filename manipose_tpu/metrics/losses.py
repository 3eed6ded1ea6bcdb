"""Training losses: weighted MPJPE/MSE, velocity, WTA/MCL + scoring BCE.

Parity with ``hpe/mh_so3_hpe/metrics/losses.py`` in fp32, fully batched
``jnp``. Pose layout is (..., L, J, C); hypothesis layout (B, H, L, J, 3);
scores (B, H, L, 1).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

# Joint weights from the MixSTE lineage (``losses.py:6-11``).
# numpy (not jnp) on purpose: device arrays at module import would
# initialize the JAX backend before entry points can switch platforms
# (the ambient sitecustomize merges JAX_PLATFORMS — CLAUDE.md); jnp ops
# consume numpy constants identically.
STANDARD_H36M_WEIGHTS = np.asarray(
    [1, 1, 2.5, 2.5, 1, 2.5, 2.5, 1, 1, 1, 1.5, 1.5, 4, 4, 1.5, 4, 4],
    dtype=np.float32,
)
STANDARD_HEVA_WEIGHTS = np.asarray(
    [1, 1, 2.5, 2.5, 1, 2.5, 2.5, 1, 1.5, 1.5, 4, 4, 1.5, 4, 4],
    dtype=np.float32,
)


def _sequential_mean(x: jnp.ndarray, dims: Sequence[int]) -> jnp.ndarray:
    """Apply means over ``dims`` one at a time, in order (axes shift as in
    the reference's sequential ``ret.mean(dim=d)``, ``losses.py:41-43``)."""
    for d in dims:
        x = jnp.mean(x, axis=d)
    return x


def weighted_mpjpe_loss(
    prediction: jnp.ndarray,
    target: jnp.ndarray,
    weights: Optional[jnp.ndarray] = None,
    dims: Optional[Sequence[int]] = None,
) -> jnp.ndarray:
    """Joint-weighted mean Euclidean error (``losses.py:14-43``)."""
    if weights is None:
        weights = jnp.ones((target.shape[-2],), prediction.dtype)
    assert weights.shape[0] == target.shape[-2]
    err = weights * jnp.linalg.norm(prediction - target, axis=-1)
    if dims is None:
        return jnp.mean(err)
    return _sequential_mean(err, dims)


def weighted_mse_loss(
    prediction: jnp.ndarray,
    target: jnp.ndarray,
    weights: Optional[jnp.ndarray] = None,
    dims: Optional[Sequence[int]] = None,
) -> jnp.ndarray:
    """Joint-weighted squared error (``losses.py:46-72``). With
    ``weights=None`` this is a plain MSE."""
    if weights is None:
        return jnp.mean((prediction - target) ** 2)
    assert weights.shape[0] == target.shape[-2]
    err = weights[:, None] * (prediction - target) ** 2
    if dims is None:
        return jnp.mean(err)
    return _sequential_mean(err, dims)


def mean_velocity_error(
    predicted: jnp.ndarray,
    target: jnp.ndarray,
    axis: int = 1,
    squared: bool = False,
) -> jnp.ndarray:
    """Mean per-joint velocity error (``losses.py:75-101``)."""
    if predicted.ndim > target.ndim:
        target = jnp.broadcast_to(
            jnp.expand_dims(target, 1), predicted.shape
        )
    else:
        assert predicted.shape == target.shape
    vel_pred = jnp.diff(predicted, axis=axis)
    vel_target = jnp.diff(target, axis=axis)
    if squared:
        return jnp.mean((vel_pred - vel_target) ** 2)
    return jnp.mean(jnp.linalg.norm(vel_pred - vel_target, axis=-1))


def _l2_loss_per_hyp(
    hypothesis: jnp.ndarray,  # (B, H, L, J, 3)
    y: jnp.ndarray,  # (B, L, J, 3)
    weights: Optional[jnp.ndarray] = None,
    squared: bool = False,
) -> jnp.ndarray:  # (B, H, L)
    """Per-hypothesis L2 loss (``losses.py:104-123``)."""
    target = jnp.broadcast_to(y[:, None], hypothesis.shape)
    if squared:
        return weighted_mse_loss(hypothesis, target, weights, dims=[4, 3])
    return weighted_mpjpe_loss(hypothesis, target, weights, dims=[3])


def wta_l2_loss_and_activate_head(
    hypothesis: jnp.ndarray,
    y: jnp.ndarray,
    weights: Optional[jnp.ndarray] = None,
    squared: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Winner-takes-all loss and winning-head index per (B, L)
    (``losses.py:126-138``; torch ``min(dim=1)`` returns values+indices)."""
    base = _l2_loss_per_hyp(hypothesis, y, weights, squared)  # (B, H, L)
    return jnp.min(base, axis=1), jnp.argmin(base, axis=1)


def binary_cross_entropy(probs: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Elementwise-mean BCE on probabilities, with torch's -100 log clamp
    (semantics of ``F.binary_cross_entropy``)."""
    log_p = jnp.clip(jnp.log(probs), -100.0, None)
    log_1p = jnp.clip(jnp.log1p(-probs), -100.0, None)
    return jnp.mean(-(targets * log_p + (1.0 - targets) * log_1p))


def wta_with_scoring_loss(
    hypothesis: jnp.ndarray,  # (B, H, L, J, 3)
    scores: jnp.ndarray,  # (B, H, L, 1)
    y: jnp.ndarray,  # (B, L, J, 3)
    beta: float,
    weights: Optional[jnp.ndarray] = None,
    squared: bool = False,
):
    """WTA loss + BCE on plausibility scores (``losses.py:141-170``).

    With ``beta == 0`` returns only the scalar WTA loss (reference quirk,
    ``losses.py:155-156``); otherwise ``(total, beta * scoring_loss)``.
    """
    unagg_wta, active_idx = wta_l2_loss_and_activate_head(
        hypothesis, y, weights=weights, squared=squared
    )
    if beta == 0:
        return jnp.mean(unagg_wta)

    n_hyp = hypothesis.shape[1]
    # one-hot winner targets, laid out (B, H, L) (``losses.py:158-163``)
    gt_scores = jnp.transpose(
        jnp.eye(n_hyp, dtype=scores.dtype)[active_idx], (0, 2, 1)
    )
    scoring_loss = binary_cross_entropy(scores[..., 0], gt_scores)
    return jnp.mean(unagg_wta) + beta * scoring_loss, beta * scoring_loss
