"""3DPCK / 3DAUC with none/scale/procrustes alignment.

Parity with ``hpe/mh_so3_hpe/metrics/pck.py`` (itself derived from
mpii_compute_3d_pck.m), but fully batched on device: the reference loops
``compute_similarity_transform`` per sample in NumPy
(``pck.py:126-129``); here the Procrustes alignment is one batched SVD.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..geometry.rotations import compose_rotations, rotate_vectors
from .joint_errors import _det3

_HIGH = jax.lax.Precision.HIGHEST


def compute_similarity_transform(
    source_points: jnp.ndarray, target_points: jnp.ndarray
) -> jnp.ndarray:
    """Batched orthogonal-Procrustes alignment of source onto target.

    Args:
      source_points: (..., N, 3)
      target_points: (..., N, 3)
    Returns:
      (..., N, 3) transformed source points.

    Parity with ``pck.py:5-73`` (det-sign fix via the Z matrix).
    """
    src = jnp.swapaxes(source_points, -1, -2)  # (..., 3, N)
    tgt = jnp.swapaxes(target_points, -1, -2)

    mu1 = jnp.mean(src, axis=-1, keepdims=True)
    mu2 = jnp.mean(tgt, axis=-1, keepdims=True)
    x1 = src - mu1
    x2 = tgt - mu2
    var1 = jnp.sum(x1**2, axis=(-1, -2), keepdims=True)

    # 3x3-output contractions as VPU mul+sum (tiny trailing-dim dots
    # crash the TPU XLA simplifier — CLAUDE.md, geometry.rotations)
    k = jnp.sum(x1[..., :, None, :] * x2[..., None, :, :], axis=-1)
    u, _, vh = jnp.linalg.svd(k)
    v = jnp.swapaxes(vh, -1, -2)

    det = _det3(compose_rotations(u, jnp.swapaxes(v, -1, -2)))
    z = jnp.broadcast_to(jnp.eye(3), k.shape).copy()
    z = z.at[..., -1, -1].multiply(jnp.sign(det))
    r = compose_rotations(
        v, compose_rotations(z, jnp.swapaxes(u, -1, -2))
    )

    rk = compose_rotations(r, k)
    scale = jnp.trace(rk, axis1=-2, axis2=-1)[..., None, None] / var1
    t = mu2 - scale * rotate_vectors(r, mu1[..., 0])[..., None]
    # R @ src for (..., 3, N) column-major points, as mul+sum
    aligned = (
        scale * jnp.sum(r[..., :, :, None] * src[..., None, :, :], axis=-2)
        + t
    )
    return jnp.swapaxes(aligned, -1, -2)


def _align(pred: jnp.ndarray, gt: jnp.ndarray, alignment: str) -> jnp.ndarray:
    if alignment == "none":
        return pred
    if alignment == "procrustes":
        return compute_similarity_transform(pred, gt)
    if alignment == "scale":
        pred_dot_pred = jnp.einsum("nkc,nkc->n", pred, pred, precision=_HIGH)
        pred_dot_gt = jnp.einsum("nkc,nkc->n", pred, gt, precision=_HIGH)
        return pred * (pred_dot_gt / pred_dot_pred)[:, None, None]
    raise ValueError(f"Invalid value for alignment: {alignment}")


def _handle_mask(mask, gt):
    if mask is None:
        return jnp.ones(gt.shape[:-1], bool)
    return mask.astype(bool)


def keypoint_3d_pck(
    pred: jnp.ndarray,
    gt: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    alignment: str = "none",
    threshold: float = 150.0,
) -> jnp.ndarray:
    """Percentage of Correct Keypoints at ``threshold`` (mm)
    (``pck.py:92-141``). pred/gt: (N, K, 3); mask: (N, K) visibility."""
    mask = _handle_mask(mask, gt)
    pred = _align(pred, gt, alignment)
    error = jnp.linalg.norm(pred - gt, axis=-1)
    correct = (error < threshold).astype(jnp.float32)
    return jnp.sum(correct * mask) / jnp.sum(mask) * 100.0


def keypoint_3d_auc(
    pred: jnp.ndarray,
    gt: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    alignment: str = "none",
) -> jnp.ndarray:
    """Area under the PCK curve over 31 thresholds in [0, 150] mm
    (``pck.py:144-198``)."""
    mask = _handle_mask(mask, gt)
    pred = _align(pred, gt, alignment)
    error = jnp.linalg.norm(pred - gt, axis=-1)
    thresholds = jnp.linspace(0.0, 150.0, 31)
    correct = (error[None] < thresholds[:, None, None]).astype(jnp.float32)
    pck_values = jnp.sum(correct * mask[None], axis=(1, 2)) / jnp.sum(mask)
    return jnp.mean(pck_values) * 100.0
