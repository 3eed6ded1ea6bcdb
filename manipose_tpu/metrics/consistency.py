"""Pose-consistency metrics: MPSCE, MPSSE, stretch, smoothness.

These are the paper's differentiator metrics. Parity with
``hpe/mh_so3_hpe/metrics/regularizations.py`` + ``metrics/utils.py``,
with the framework-native pose layout (B, L, J, 3) instead of the
reference's torch-ism (B, 3, J, L). Std/var use ddof=1 (torch default).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..geometry.skeleton import Skeleton


def measure_bones_length(
    joints_coords: jnp.ndarray, skeleton: Skeleton
) -> jnp.ndarray:
    """Per-frame bone lengths.

    Args:
      joints_coords: (..., L, J, 3)
    Returns:
      (..., L, num_bones)

    Reference: ``metrics/utils.py:4-20`` (layout (B,3,J,L) -> (B,bones,L)).
    """
    child = np.asarray([j for j, _ in skeleton.bones])
    parent = np.asarray([p for _, p in skeleton.bones])
    diff = joints_coords[..., child, :] - joints_coords[..., parent, :]
    return jnp.sqrt(jnp.sum(diff**2, axis=-1))


def _time_stat(joints_coords, skeleton, mode):
    lengths = measure_bones_length(joints_coords, skeleton)  # (..., L, S)
    if mode == "std":
        stat = jnp.std(lengths, axis=-2, ddof=1)
        aggregator = jnp.mean
    else:
        stat = jnp.var(lengths, axis=-2, ddof=1)
        aggregator = {
            "average": jnp.mean,
            "sum": jnp.sum,
            "min": jnp.min,
            "max": jnp.max,
        }.get(mode)
        if aggregator is None:
            raise ValueError(
                f"Unexpected value for 'mode': {mode}. "
                "Accepted values are 'average', 'sum', 'std', 'min', 'max'."
            )
    return stat, aggregator


def segments_time_consistency(
    joints_coords: jnp.ndarray, skeleton: Skeleton, mode: str
) -> jnp.ndarray:
    """MPSCE: spread of each bone's length over time
    (``regularizations.py:8-47``). Input (..., L, J, 3)."""
    stat, aggregator = _time_stat(joints_coords, skeleton, mode)
    return aggregator(stat)


def segments_time_consistency_per_bone(
    joints_coords: jnp.ndarray, skeleton: Skeleton, mode: str
) -> jnp.ndarray:
    """Per-bone MPSCE (``regularizations.py:50-60``). Input (B, L, J, 3);
    aggregates over the batch axis."""
    stat, aggregator = _time_stat(joints_coords, skeleton, mode)
    return aggregator(stat, axis=0)


def segments_max_stretch_per_bone(
    joints_coords: jnp.ndarray, skeleton: Skeleton
):
    """(min, max) bone length over all frames/batches
    (``regularizations.py:63-74``)."""
    lengths = measure_bones_length(joints_coords, skeleton).reshape(
        -1, skeleton.num_bones
    )
    return jnp.min(lengths, axis=0), jnp.max(lengths, axis=0)


def segments_max_diff_stretch_per_bone(
    joints_coords: jnp.ndarray, skeleton: Skeleton
):
    """Max frame-to-frame bone-length jump, with argmax indices
    (``regularizations.py:77-94``; torch ``max(dim=0)`` returns both)."""
    lengths = measure_bones_length(joints_coords, skeleton)  # (..., L, S)
    diffs = jnp.abs(jnp.diff(lengths, axis=-2)).reshape(-1, skeleton.num_bones)
    return jnp.max(diffs, axis=0), jnp.argmax(diffs, axis=0)


def _symmetry(joints_coords, skeleton, squared):
    lengths = measure_bones_length(joints_coords, skeleton)  # (..., L, S)
    left = np.asarray(skeleton.bones_left)
    right = np.asarray(skeleton.bones_right)
    diff = jnp.abs(lengths[..., left] - lengths[..., right])
    if squared:
        diff = diff**2.0
    return diff


def sagittal_symmetry(
    joints_coords: jnp.ndarray,
    skeleton: Skeleton,
    mode: str,
    squared: bool = True,
) -> jnp.ndarray:
    """MPSSE: left/right bone-length asymmetry
    (``regularizations.py:97-139``). Input (..., L, J, 3)."""
    diff = _symmetry(joints_coords, skeleton, squared)
    aggregator = {"average": jnp.mean, "sum": jnp.sum}.get(mode)
    if aggregator is None:
        raise ValueError(
            f"Unexpected value for 'mode': {mode}. "
            "Accepted values are 'average' and 'sum'."
        )
    return aggregator(diff)


def sagittal_symmetry_per_bone(
    joints_coords: jnp.ndarray,
    skeleton: Skeleton,
    mode: str,
    squared: bool = True,
) -> jnp.ndarray:
    """Per-bone MPSSE over flattened batch*time
    (``regularizations.py:142-157``)."""
    diff = _symmetry(joints_coords, skeleton, squared)
    diff = diff.reshape(-1, len(skeleton.bones_left))
    aggregator = {"average": jnp.mean, "sum": jnp.sum}[mode]
    return aggregator(diff, axis=0)


def smoothness_regularization(
    prediction: jnp.ndarray,
    weights: Optional[jnp.ndarray] = None,
    axis: int = 1,
) -> jnp.ndarray:
    """Mean squared velocity of the prediction
    (``regularizations.py:160-174``)."""
    velocity = jnp.diff(prediction, axis=axis)
    if weights is None:
        weights = jnp.ones((velocity.shape[-2],), velocity.dtype)
    assert weights.shape[0] == velocity.shape[-2]
    return jnp.mean(weights[:, None] * velocity**2)
