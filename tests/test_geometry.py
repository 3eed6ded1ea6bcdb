"""Geometry core: skeleton metadata, rotation representations, FK.

Parity oracles: the reference's numpy Skeleton and torch FK are imported
read-only from /root/reference (see conftest.load_ref_module)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from manipose_tpu.geometry import (
    Skeleton,
    build_t_pose,
    forward_kinematics,
    h36m_skeleton_16,
    h36m_skeleton_17,
    h36m_skeleton_32,
    normalize_vector,
    rot4d_to_matrix,
    rot6d_to_matrix,
)

from conftest import load_ref_module

ref_skeleton_mod = load_ref_module("mh_so3_hpe.data.skeleton")


def _reference_h36m_17():
    """Build the reference 17-joint skeleton via its own remove_joints."""
    h36m_lifting = load_ref_module("mh_so3_hpe.data.h36m_lifting")
    skel = h36m_lifting.h36m_skeleton
    import copy

    skel = copy.deepcopy(skel)
    skel.remove_joints([4, 5, 9, 10, 11, 16, 20, 21, 22, 23, 24, 28, 29, 30, 31])
    skel._parents[11] = 8
    skel._parents[14] = 8
    skel._compute_metadata()
    return skel


class TestSkeleton:
    def test_h36m17_matches_reference(self):
        ref = _reference_h36m_17()
        ours = h36m_skeleton_17()
        assert ours.num_joints == 17 and ours.num_bones == 16
        np.testing.assert_array_equal(ours.parents, ref.parents)
        assert list(ours.joints_left) == list(ref.joints_left)
        assert list(ours.joints_right) == list(ref.joints_right)
        assert ours.bones == ref.bones
        assert ours.bones_left == ref.bones_left
        assert ours.bones_right == ref.bones_right
        assert list(ours.has_children) == list(ref.has_children)
        assert list(ours.joints_names) == list(ref.joints_names)
        # T-pose operators match the reference dict keyed 1..16
        h36m_lifting = load_ref_module("mh_so3_hpe.data.h36m_lifting")
        ops = ours.t_pose_array()
        np.testing.assert_array_equal(ops[0], 0.0)
        for j in range(1, 17):
            np.testing.assert_array_equal(
                ops[j], h36m_lifting.T_POSE_OPERATORS[j].numpy()
            )

    def test_h36m16(self):
        skel = h36m_skeleton_16()
        assert skel.num_joints == 16 and skel.num_bones == 15
        assert skel.parents == (-1, 0, 1, 2, 0, 4, 5, 0, 7, 8, 8, 10, 11, 8, 13, 14)
        # T-pose operators re-indexed past the removed Neck/Nose:
        # LShoulder (10) points left, RShoulder (13) right, Head (9) up
        ops = skel.t_pose_array()
        np.testing.assert_array_equal(ops[9], [0, 1, 0])
        np.testing.assert_array_equal(ops[10], [-1, 0, 0])
        np.testing.assert_array_equal(ops[13], [1, 0, 0])

    def test_levels_cover_all_joints(self):
        for skel in (h36m_skeleton_32(), h36m_skeleton_17(), h36m_skeleton_16()):
            joints = sorted(j for level in skel.levels for j in level)
            assert joints == list(range(skel.num_joints))
            for level in skel.levels[1:]:
                for j in level:
                    # parent is at a strictly earlier level
                    p = skel.parents[j]
                    assert any(p in lv for lv in skel.levels[: skel.levels.index(level)])


class TestRotations:
    def test_normalize_vector_clamps(self):
        v = jnp.asarray([[3.0, 4.0, 0.0], [0.0, 0.0, 0.0]])
        out = np.asarray(normalize_vector(v))
        np.testing.assert_allclose(out[0], [0.6, 0.8, 0.0], rtol=1e-6)
        np.testing.assert_array_equal(out[1], 0.0)  # zero vec / 1e-8 clamp

    def test_rot6d_is_rotation(self):
        rng = np.random.default_rng(0)
        rep = rng.normal(size=(128, 6)).astype(np.float32)
        R = np.asarray(rot6d_to_matrix(jnp.asarray(rep)))
        eye = np.einsum("bij,bkj->bik", R, R)
        np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape), atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)

    def test_rot6d_matches_reference_math(self):
        """Torch oracle mirroring rotation_tools.py:35-57 (device-neutral)."""
        rng = np.random.default_rng(1)
        rep = rng.normal(size=(64, 6)).astype(np.float32)
        t = torch.from_numpy(rep)

        def t_normalize(v):
            mag = torch.sqrt(v.pow(2).sum(1))
            mag = torch.max(mag, torch.tensor([1e-8]))
            return v / mag.view(-1, 1)

        x = t_normalize(t[:, :3])
        z = t_normalize(torch.cross(x, t[:, 3:], dim=1))
        y = torch.cross(z, x, dim=1)
        ref = torch.stack([x, y, z], dim=2).numpy()

        ours = np.asarray(rot6d_to_matrix(jnp.asarray(rep)))
        np.testing.assert_allclose(ours, ref, atol=1e-6)

    def test_rot4d_is_rotation(self):
        rng = np.random.default_rng(2)
        rep = rng.normal(size=(64, 4)).astype(np.float32)
        R = np.asarray(rot4d_to_matrix(jnp.asarray(rep)))
        eye = np.einsum("bij,bkj->bik", R, R)
        np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape), atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)

    def test_batched_leading_axes(self):
        rng = np.random.default_rng(3)
        rep = rng.normal(size=(2, 5, 3, 6)).astype(np.float32)
        R = rot6d_to_matrix(jnp.asarray(rep))
        assert R.shape == (2, 5, 3, 3, 3)
        flat = rot6d_to_matrix(jnp.asarray(rep.reshape(-1, 6)))
        np.testing.assert_allclose(
            np.asarray(R).reshape(-1, 3, 3), np.asarray(flat), atol=1e-6
        )


class TestKinematics:
    def _random_rotations(self, rng, shape):
        from scipy.spatial.transform import Rotation

        # honor the per-test rng (a hardcoded random_state would make
        # every FK test reuse one identical rotation sample)
        flat = Rotation.random(
            int(np.prod(shape)), random_state=rng
        ).as_matrix()
        return flat.reshape(*shape, 3, 3).astype(np.float32)

    def test_t_pose_matches_reference_loop(self):
        skel = h36m_skeleton_17()
        rng = np.random.default_rng(4)
        lengths = rng.uniform(0.1, 0.6, size=(8, skel.num_bones)).astype(np.float32)
        ours = np.asarray(build_t_pose(jnp.asarray(lengths), skel))

        # Reference-style sequential loop (pose_decoder.py:98-120)
        ref = np.zeros((8, skel.num_joints, 3), dtype=np.float32)
        ops = skel.t_pose_array()
        for b in range(skel.num_bones):
            j = b + 1
            ref[:, j] = ref[:, skel.parents[j]] + ops[j] * lengths[:, b : b + 1]
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_fk_matches_reference_torch(self):
        """End-to-end FK vs the reference forward_kinematics (torch)."""
        ref_fk = load_ref_module(
            "mh_so3_hpe.architectures.utils.forward_kinematics"
        )
        skel = h36m_skeleton_17()
        ref_skel = _reference_h36m_17()
        B = 6
        rng = np.random.default_rng(5)
        rotations = self._random_rotations(rng, (B, skel.num_joints))
        lengths = rng.uniform(0.1, 0.6, size=(B, skel.num_bones)).astype(np.float32)
        roots = rng.normal(size=(B, 3)).astype(np.float32)

        ours = np.asarray(
            forward_kinematics(
                jnp.asarray(rotations), jnp.asarray(lengths), jnp.asarray(roots), skel
            )
        )

        # Reference path: build t_pose with its loop, then its FK.
        t_pose = np.zeros((B, skel.num_joints, 3), dtype=np.float32)
        ops = skel.t_pose_array()
        for b in range(skel.num_bones):
            j = b + 1
            t_pose[:, j] = t_pose[:, skel.parents[j]] + ops[j] * lengths[:, b : b + 1]
        ref = ref_fk.forward_kinematics(
            t_pose=torch.from_numpy(t_pose),
            rotations=torch.from_numpy(rotations),
            root_positions=torch.from_numpy(roots),
            skeleton=ref_skel,
        ).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_fk_identity_rotations_give_t_pose(self):
        skel = h36m_skeleton_17()
        lengths = jnp.ones((1, skel.num_bones), jnp.float32) * 0.5
        eye = jnp.broadcast_to(jnp.eye(3), (1, skel.num_joints, 3, 3))
        pos = forward_kinematics(eye, lengths, jnp.zeros((1, 3)), skel)
        np.testing.assert_allclose(
            np.asarray(pos), np.asarray(build_t_pose(lengths, skel)), atol=1e-6
        )

    def test_fk_broadcasts_bone_lengths_over_time(self):
        """(B,H,L) rotations with (B,1,1) shared lengths — the rMCL layout."""
        skel = h36m_skeleton_17()
        rng = np.random.default_rng(6)
        B, H, L = 2, 3, 4
        rotations = self._random_rotations(rng, (B, H, L, skel.num_joints))
        lengths = rng.uniform(0.1, 0.6, size=(B, 1, 1, skel.num_bones)).astype(
            np.float32
        )
        roots = np.zeros((B, H, L, 3), dtype=np.float32)
        out = forward_kinematics(
            jnp.asarray(rotations), jnp.asarray(lengths), jnp.asarray(roots), skel
        )
        assert out.shape == (B, H, L, skel.num_joints, 3)
        # same as flattening manually
        flat = forward_kinematics(
            jnp.asarray(rotations.reshape(B * H * L, skel.num_joints, 3, 3)),
            jnp.asarray(
                np.broadcast_to(lengths, (B, H, L, skel.num_bones)).reshape(
                    B * H * L, -1
                )
            ),
            jnp.zeros((B * H * L, 3)),
            skel,
        )
        np.testing.assert_allclose(
            np.asarray(out).reshape(B * H * L, -1, 3), np.asarray(flat), atol=1e-6
        )
