"""Continuous rotation representations -> SO(3), batched over any leading axes.

TPU-first re-derivation of the reference's 6D (Zhou et al. 2019) and
custom 4D representations (``hpe/mh_so3_hpe/architectures/utils/
rotation_tools.py:35-116``). Differences by design:

- fully batched over arbitrary leading dimensions (the reference flattens
  to 2D and is hard-coded to CUDA for its epsilon tensor,
  ``rotation_tools.py:11-14``);
- pure ``jnp`` ops that fuse into the surrounding XLA graph.

Numerics match the reference in fp32: the vector-norm clamp uses the same
``max(||v||, 1e-8)`` formulation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_NORM_EPS = 1e-8


def normalize_vector(v: jnp.ndarray) -> jnp.ndarray:
    """v / max(||v||_2, 1e-8) along the last axis.

    Parity with ``rotation_tools.py:6-17`` (which clamps the magnitude,
    not the squared magnitude).
    """
    mag = jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True))
    return v / jnp.maximum(mag, jnp.asarray(_NORM_EPS, dtype=v.dtype))


def rot6d_to_matrix(rep: jnp.ndarray) -> jnp.ndarray:
    """6D representation -> rotation matrix, Gram-Schmidt style.

    ``rep[..., :3]`` is the (un-normalized) first column, ``rep[..., 3:]``
    seeds the second. Columns of the result are ``(x, y, z)``; parity with
    ``rotation_tools.py:35-57``.

    Args:
      rep: (..., 6)
    Returns:
      (..., 3, 3)
    """
    x_raw = rep[..., 0:3]
    y_raw = rep[..., 3:6]

    x = normalize_vector(x_raw)
    z = normalize_vector(jnp.cross(x, y_raw))
    y = jnp.cross(z, x)
    return jnp.stack([x, y, z], axis=-1)  # columns


def rot4d_to_matrix(rep: jnp.ndarray) -> jnp.ndarray:
    """Custom 4D representation -> rotation matrix.

    Two normalized (cos, sin) pairs define rotations R_theta (about z) and
    R_phi (about x) which are composed; parity with
    ``rotation_tools.py:60-116``.

    Args:
      rep: (..., 4)
    Returns:
      (..., 3, 3)
    """
    cs_theta = normalize_vector(rep[..., 0:2])
    cs_phi = normalize_vector(rep[..., 2:4])

    batch_shape = rep.shape[:-1]
    zeros = jnp.zeros(batch_shape + (1,), dtype=rep.dtype)

    theta_y = jnp.concatenate([cs_theta, zeros], axis=-1)
    theta_z = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 1.0], dtype=rep.dtype), batch_shape + (3,)
    )
    theta_x = jnp.cross(theta_y, theta_z)

    phi_y = jnp.concatenate([zeros, cs_phi], axis=-1)
    phi_x = jnp.broadcast_to(
        jnp.asarray([1.0, 0.0, 0.0], dtype=rep.dtype), batch_shape + (3,)
    )
    phi_z = jnp.cross(phi_x, phi_y)

    r_theta = jnp.stack([theta_x, theta_y, theta_z], axis=-1)
    r_phi = jnp.stack([phi_x, phi_y, phi_z], axis=-1)
    return compose_rotations(r_theta, r_phi)


def compose_rotations(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched 3x3 @ 3x3 as VPU mul+sum.

    3x3 matmuls cannot tile the 128x128 MXU; expressing them as an
    elementwise multiply + reduction keeps them on the VPU in full fp32
    (and sidesteps a TPU XLA algebraic-simplifier crash observed on tiny
    trailing-dim dots)."""
    return jnp.sum(a[..., :, :, None] * b[..., None, :, :], axis=-2)


def rotate_vectors(r: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Batched R @ v for 3-vectors as VPU mul+sum. r: (...,3,3), v: (...,3)."""
    return jnp.sum(r * v[..., None, :], axis=-1)


def rot_to_matrix(rep: jnp.ndarray, rot_rep_dim: int) -> jnp.ndarray:
    """Dispatch on representation dimension (4 or 6).

    Parity with ``pose_decoder.py:57-83``.
    """
    if rot_rep_dim == 6:
        return rot6d_to_matrix(rep)
    if rot_rep_dim == 4:
        return rot4d_to_matrix(rep)
    raise ValueError(f"Unsupported rotation representation dim: {rot_rep_dim}")
