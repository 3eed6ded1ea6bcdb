"""Forward kinematics and T-pose construction, level-parallel for TPU.

The reference rolls out the kinematic tree one joint at a time in Python
(``hpe/mh_so3_hpe/architectures/utils/forward_kinematics.py:25-47``) and
builds the T-pose with a 16-step sequential loop
(``hpe/mh_so3_hpe/architectures/pose_decoder.py:98-120``). On TPU that
serializes tiny matmuls. Here the tree is processed *by level*: all joints
at equal depth share one batched 3x3 matmul, so the whole FK is
``max_depth`` (~6 for H36M-17) fused batched ops instead of ``J`` ones.

Semantics parity:
- world rotation of joint j = world rotation of parent @ local rotation j
- position j = world_rot_j @ (t_pose_j - t_pose_parent) + position_parent
- root position = given root_positions; root world rotation = local R[0]
- t_pose_j - t_pose_parent == t_pose_operator_j * bone_length_{j-1}
  (bones are ordered so bone b connects joint b+1 to its parent, and
  parents[j] < j — asserted below).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .rotations import compose_rotations, rotate_vectors
from .skeleton import Skeleton


def _check_topological(skeleton: Skeleton) -> None:
    parents = skeleton.parents
    assert parents[0] == -1, "joint 0 must be the root"
    for j, p in enumerate(parents[1:], start=1):
        assert 0 <= p < j, (
            "kinematics requires topologically-ordered parents "
            f"(parents[{j}]={p}); bone b must connect joint b+1 to its parent"
        )


def build_t_pose(bone_lengths: jnp.ndarray, skeleton: Skeleton) -> jnp.ndarray:
    """T-pose joint positions from per-bone lengths.

    Parity with ``pose_decoder.py:98-120`` (sequential loop there), but
    computed in closed form: position_j = sum over ancestors a of
    operator_a * length_{a-1}, which is a single (J, J) prefix matrix
    multiply — one MXU op instead of a 16-step loop.

    Args:
      bone_lengths: (..., num_bones)
      skeleton: static skeleton with t_pose_operators.
    Returns:
      (..., num_joints, 3) T-pose positions (root at origin).
    """
    _check_topological(skeleton)
    ops = skeleton.t_pose_array()  # (J, 3), row 0 zero
    n_joints = skeleton.num_joints

    # ancestry[j, a] = 1 if joint a (>=1) is on the path root->j (incl. j)
    ancestry = np.zeros((n_joints, n_joints), dtype=np.float32)
    parents = skeleton.parents
    for j in range(1, n_joints):
        a = j
        while a != 0:
            ancestry[j, a] = 1.0
            a = parents[a]
    # offsets per joint j>=1: ops[j] * len[j-1]
    lengths = jnp.concatenate(
        [jnp.zeros(bone_lengths.shape[:-1] + (1,), bone_lengths.dtype), bone_lengths],
        axis=-1,
    )  # (..., J) with root entry 0
    offsets = lengths[..., None] * jnp.asarray(ops)  # (..., J, 3)
    return jnp.einsum(
        "ja,...ac->...jc",
        jnp.asarray(ancestry),
        offsets,
        precision=jax.lax.Precision.HIGHEST,
    )


def forward_kinematics(
    rotations: jnp.ndarray,
    bone_lengths: jnp.ndarray,
    root_positions: jnp.ndarray,
    skeleton: Skeleton,
) -> jnp.ndarray:
    """Level-parallel FK rollout.

    Parity with ``forward_kinematics.py:6-48`` composed with the T-pose
    construction of ``pose_decoder.py:98-120`` (offset_j there is exactly
    ``t_pose_operator_j * bone_length_{j-1}``).

    Args:
      rotations: (..., J, 3, 3) local rotation matrices.
      bone_lengths: (..., num_bones) per-bone lengths (broadcastable to
        the rotations batch shape).
      root_positions: (..., 3) root joint positions.
      skeleton: static skeleton.
    Returns:
      (..., J, 3) world joint positions.
    """
    _check_topological(skeleton)
    n_joints = skeleton.num_joints
    assert rotations.shape[-3:] == (n_joints, 3, 3)
    ops = jnp.asarray(skeleton.t_pose_array())  # (J, 3)
    parents = skeleton.parents_array()

    batch_shape = jnp.broadcast_shapes(
        rotations.shape[:-3], bone_lengths.shape[:-1], root_positions.shape[:-1]
    )
    rotations = jnp.broadcast_to(rotations, batch_shape + (n_joints, 3, 3))
    bone_lengths = jnp.broadcast_to(
        bone_lengths, batch_shape + (skeleton.num_bones,)
    ).astype(rotations.dtype)
    root_positions = jnp.broadcast_to(root_positions, batch_shape + (3,)).astype(
        rotations.dtype
    )

    # offsets[..., j, :] = ops[j] * len[j-1]  (j >= 1; row 0 zero)
    lengths = jnp.concatenate(
        [jnp.zeros(batch_shape + (1,), bone_lengths.dtype), bone_lengths], axis=-1
    )
    offsets = lengths[..., None] * ops  # (..., J, 3)

    world_rot = jnp.zeros_like(rotations)
    world_rot = world_rot.at[..., 0, :, :].set(rotations[..., 0, :, :])
    positions = jnp.zeros(batch_shape + (n_joints, 3), rotations.dtype)
    positions = positions.at[..., 0, :].set(root_positions)

    for level in skeleton.levels[1:]:
        js = np.asarray(level)
        ps = parents[js]
        r_parent = world_rot[..., ps, :, :]  # (..., n, 3, 3)
        r_local = rotations[..., js, :, :]
        # 3x3 rotation algebra runs on the VPU as mul+sum (fp32 exact);
        # see geometry.rotations.compose_rotations for rationale.
        r_world = compose_rotations(r_parent, r_local)
        world_rot = world_rot.at[..., js, :, :].set(r_world)
        off = offsets[..., js, :]
        pos = rotate_vectors(r_world, off) + positions[..., ps, :]
        positions = positions.at[..., js, :].set(pos)

    return positions
