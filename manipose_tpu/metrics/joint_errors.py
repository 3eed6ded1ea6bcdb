"""Evaluation joint-error metrics incl. Procrustes P-MPJPE.

Parity with ``hpe/mh_so3_hpe/metrics/mean_joint_errors.py``. The
reference's P-MPJPE hops to NumPy for the SVD
(``mean_joint_errors.py:152-153``); here it is a batched on-device
``jnp.linalg.svd`` so the whole eval stack stays in one XLA graph.
Pose layouts: "flat" metrics accept any (..., J, 3); the segment-length
error uses the framework-native (B, L, J, 3) layout (the reference's
(B, 3, J, L) is a torch-ism).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..geometry.rotations import compose_rotations
from ..geometry.skeleton import Skeleton
from .consistency import measure_bones_length

_AGGREGATORS = {
    "average": jnp.mean,
    "sum": jnp.sum,
    "no_agg": lambda x, axis=None: x,
}


def _agg(mode: str):
    if mode not in _AGGREGATORS:
        raise ValueError(
            f"Unexpected value for 'mode': {mode}. "
            "Accepted values are 'average', 'sum' and 'no_agg'."
        )
    return _AGGREGATORS[mode]


def mpjpe_error(batch_imp: jnp.ndarray, batch_gt: jnp.ndarray, mode: str):
    """Euclidean error per joint sample (``mean_joint_errors.py:31-36``)."""
    a = batch_imp.reshape(-1, 3)
    b = batch_gt.reshape(-1, 3)
    return _agg(mode)(jnp.linalg.norm(b - a, axis=1))


def mse_error(batch_imp: jnp.ndarray, batch_gt: jnp.ndarray, mode: str):
    a = batch_imp.reshape(-1, 3)
    b = batch_gt.reshape(-1, 3)
    return _agg(mode)(jnp.sum((b - a) ** 2, axis=1))


def jointwise_error(batch_imp: jnp.ndarray, batch_gt: jnp.ndarray, mode: str):
    j = batch_gt.shape[-2]
    a = batch_imp.reshape(-1, j, 3)
    b = batch_gt.reshape(-1, j, 3)
    return _agg(mode)(jnp.linalg.norm(b - a, axis=2), axis=0)


def jointwise_mse(batch_imp: jnp.ndarray, batch_gt: jnp.ndarray, mode: str):
    j = batch_gt.shape[-2]
    a = batch_imp.reshape(-1, j, 3)
    b = batch_gt.reshape(-1, j, 3)
    return _agg(mode)(jnp.sum((b - a) ** 2, axis=2), axis=0)


def coordwise_error(batch_imp: jnp.ndarray, batch_gt: jnp.ndarray, mode: str):
    a = batch_imp.reshape(-1, 3)
    b = batch_gt.reshape(-1, 3)
    return _agg(mode)(jnp.abs(b - a), axis=0)


def segments_len_err(
    batch_imp: jnp.ndarray,  # (B, L, J, 3)
    batch_gt: jnp.ndarray,  # (B, L, J, 3)
    skeleton: Skeleton,
    mode: str,
    signed: bool = True,
):
    """Bone-length error between prediction and GT
    (``mean_joint_errors.py:83-130``; reference layout (B,3,J,L))."""
    pred_len = measure_bones_length(batch_imp, skeleton).reshape(
        -1, skeleton.num_bones
    )
    gt_len = measure_bones_length(batch_gt, skeleton).reshape(
        -1, skeleton.num_bones
    )
    diff = gt_len - pred_len
    if not signed:
        diff = jnp.abs(diff)
    return _agg(mode)(diff)


def p_mpjpe(predicted: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """MPJPE after rigid alignment (Procrustes, "Protocol #2").

    Batched fp32 SVD on device; parity with
    ``mean_joint_errors.py:144-189`` (incl. the det-sign reflection fix).
    Accepts (..., J, 3).
    """
    assert predicted.shape == target.shape
    assert predicted.shape[-1] == 3
    j = predicted.shape[-2]
    predicted = predicted.reshape(-1, j, 3)
    target = target.reshape(-1, j, 3)

    mu_x = jnp.mean(target, axis=1, keepdims=True)
    mu_y = jnp.mean(predicted, axis=1, keepdims=True)
    x0 = target - mu_x
    y0 = predicted - mu_y
    norm_x = jnp.sqrt(jnp.sum(x0**2, axis=(1, 2), keepdims=True))
    norm_y = jnp.sqrt(jnp.sum(y0**2, axis=(1, 2), keepdims=True))
    x0 = x0 / norm_x
    y0 = y0 / norm_y

    # All 3x3-output contractions below are VPU mul+sum: tiny
    # trailing-dim dots cannot tile the MXU and crash the TPU XLA
    # algebraic simplifier (CLAUDE.md; same policy as geometry.rotations)
    h = jnp.sum(x0[..., :, :, None] * y0[..., :, None, :], axis=-3)
    u, s, vt = jnp.linalg.svd(h)
    v = jnp.swapaxes(vt, 1, 2)
    r = compose_rotations(v, jnp.swapaxes(u, 1, 2))

    # Fix improper rotations (reflections).
    sign_det = jnp.sign(_det3(r))[:, None]
    v = v.at[:, :, -1].multiply(sign_det)
    s = s.at[:, -1].multiply(sign_det[:, 0])
    r = compose_rotations(v, jnp.swapaxes(u, 1, 2))

    tr = jnp.sum(s, axis=1, keepdims=True)[..., None]
    a = tr * norm_x / norm_y
    # x @ R for (N, P, 3) row vectors, as mul+sum
    def xr(x):
        return jnp.sum(x[..., :, None] * r[..., None, :, :], axis=-2)

    t = mu_x - a * xr(mu_y)
    predicted_aligned = a * xr(predicted) + t
    return jnp.mean(jnp.linalg.norm(predicted_aligned - target, axis=-1))


def _det3(m: jnp.ndarray) -> jnp.ndarray:
    """Closed-form 3x3 determinant (elementwise; no LU on device)."""
    return (
        m[..., 0, 0] * (m[..., 1, 1] * m[..., 2, 2] - m[..., 1, 2] * m[..., 2, 1])
        - m[..., 0, 1] * (m[..., 1, 0] * m[..., 2, 2] - m[..., 1, 2] * m[..., 2, 0])
        + m[..., 0, 2] * (m[..., 1, 0] * m[..., 2, 1] - m[..., 1, 1] * m[..., 2, 0])
    )
