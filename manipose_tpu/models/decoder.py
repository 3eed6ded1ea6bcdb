"""Pose decoder: rotation representation + bone lengths -> 3D joints.

Functional counterpart of the reference's ``PoseDecoder``
(``hpe/mh_so3_hpe/architectures/pose_decoder.py:10-120``). Instead of
materializing a T-pose tensor and flattening to (B*L, J, ...), the
rotation conversion, per-bone offsets and level-parallel FK fuse into one
XLA graph over arbitrary leading axes — the rMCL case (B, H, L, ...)
needs no reshapes at all.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..geometry import forward_kinematics, rot_to_matrix
from ..geometry.skeleton import Skeleton


def decode_poses(
    rotations_repr: jnp.ndarray,  # (..., J, rot_rep_dim)
    bone_lengths: jnp.ndarray,  # (..., num_bones) broadcastable
    root_positions: jnp.ndarray,  # (..., 3) broadcastable
    skeleton: Skeleton,
    rot_rep_dim: int = 6,
) -> jnp.ndarray:
    """-> (..., J, 3) world joint positions on the pose manifold.

    Parity with ``PoseDecoder.forward`` (``pose_decoder.py:32-55``): the
    reference broadcasts one bone-length set per sequence over time
    (``pose_decoder.py:85-96``); here that is plain jnp broadcasting of
    ``bone_lengths``.
    """
    assert rotations_repr.shape[-1] == rot_rep_dim, (
        f"rotation representation dim mismatch: {rotations_repr.shape[-1]} "
        f"!= {rot_rep_dim}"
    )
    assert rotations_repr.shape[-2] == skeleton.num_joints
    rotations = rot_to_matrix(rotations_repr, rot_rep_dim)
    return forward_kinematics(rotations, bone_lengths, root_positions, skeleton)
