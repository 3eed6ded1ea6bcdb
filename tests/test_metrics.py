"""Metrics/losses parity vs the reference torch implementations
(imported read-only from /root/reference as oracles)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

import manipose_tpu.metrics as M
from manipose_tpu.geometry import h36m_skeleton_17

from conftest import load_ref_module

ref_losses = load_ref_module("mh_so3_hpe.metrics.losses")
ref_errors = load_ref_module("mh_so3_hpe.metrics.mean_joint_errors")
ref_reg = load_ref_module("mh_so3_hpe.metrics.regularizations")
ref_pck = load_ref_module("mh_so3_hpe.metrics.pck")

from test_geometry import _reference_h36m_17  # noqa: E402

SKEL = h36m_skeleton_17()
REF_SKEL = _reference_h36m_17()
RNG = np.random.default_rng(0)

B, H, L, J = 3, 5, 9, 17


def rand(*shape):
    return RNG.normal(size=shape).astype(np.float32)


PRED = rand(B, L, J, 3)
TARGET = rand(B, L, J, 3)
HYPS = rand(B, H, L, J, 3)
SCORES_LOGITS = rand(B, H, L, 1)
SCORES = np.asarray(
    torch.from_numpy(SCORES_LOGITS).softmax(dim=1).numpy(), np.float32
)
WEIGHTS = np.asarray(ref_losses.STANDARD_H36M_WEIGHTS.numpy())


def t(x):
    return torch.from_numpy(np.asarray(x))


class TestLosses:
    @pytest.mark.parametrize("weights", [None, WEIGHTS])
    @pytest.mark.parametrize("dims", [None, [1]])
    def test_weighted_mpjpe(self, weights, dims):
        ours = M.weighted_mpjpe_loss(
            jnp.asarray(PRED), jnp.asarray(TARGET),
            None if weights is None else jnp.asarray(weights), dims
        )
        ref = ref_losses.weighted_mpjpe_loss(
            t(PRED), t(TARGET),
            None if weights is None else t(weights), dims
        )
        np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-5)

    @pytest.mark.parametrize("weights", [None, WEIGHTS])
    def test_weighted_mse(self, weights):
        ours = M.weighted_mse_loss(
            jnp.asarray(PRED), jnp.asarray(TARGET),
            None if weights is None else jnp.asarray(weights)
        )
        ref = ref_losses.weighted_mse_loss(
            t(PRED), t(TARGET), None if weights is None else t(weights)
        )
        np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-5)

    @pytest.mark.parametrize("squared", [False, True])
    def test_velocity(self, squared):
        ours = M.mean_velocity_error(
            jnp.asarray(PRED), jnp.asarray(TARGET), axis=1, squared=squared
        )
        ref = ref_losses.mean_velocity_error(
            t(PRED), t(TARGET), axis=1, squared=squared
        )
        np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-5)

    # (squared=True, weights=None) is a dead, broken path in the reference
    # too: weighted_mse_loss ignores `dims` without weights (losses.py:56-57)
    # so wta's min(dim=1) errors there as well.
    @pytest.mark.parametrize(
        "squared,weights",
        [(False, None), (False, WEIGHTS), (True, WEIGHTS)],
    )
    def test_wta(self, squared, weights):
        vals, idx = M.wta_l2_loss_and_activate_head(
            jnp.asarray(HYPS), jnp.asarray(TARGET),
            None if weights is None else jnp.asarray(weights), squared
        )
        ref_vals, ref_idx = ref_losses.wta_l2_loss_and_activate_head(
            t(HYPS), t(TARGET),
            None if weights is None else t(weights), squared
        )
        np.testing.assert_allclose(np.asarray(vals), ref_vals.numpy(), rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(idx), ref_idx.numpy())

    def test_wta_with_scoring(self):
        total, score_part = M.wta_with_scoring_loss(
            jnp.asarray(HYPS), jnp.asarray(SCORES), jnp.asarray(TARGET),
            beta=0.1, weights=jnp.asarray(WEIGHTS)
        )
        ref_total, ref_score = ref_losses.wta_with_scoring_loss(
            t(HYPS), t(SCORES), t(TARGET), beta=0.1, weights=t(WEIGHTS)
        )
        np.testing.assert_allclose(np.asarray(total), ref_total.numpy(), rtol=1e-4)
        np.testing.assert_allclose(
            np.asarray(score_part), ref_score.numpy(), rtol=1e-4
        )

    def test_wta_with_scoring_beta0(self):
        out = M.wta_with_scoring_loss(
            jnp.asarray(HYPS), jnp.asarray(SCORES), jnp.asarray(TARGET), beta=0
        )
        ref = ref_losses.wta_with_scoring_loss(
            t(HYPS), t(SCORES), t(TARGET), beta=0
        )
        np.testing.assert_allclose(np.asarray(out), ref.numpy(), rtol=1e-5)


class TestJointErrors:
    @pytest.mark.parametrize("mode", ["average", "sum", "no_agg"])
    def test_mpjpe_mse(self, mode):
        for ours_fn, ref_fn in [
            (M.mpjpe_error, ref_errors.mpjpe_error),
            (M.mse_error, ref_errors.mse_error),
            (M.jointwise_error, ref_errors.jointwise_error),
            (M.jointwise_mse, ref_errors.jointwise_mse),
            (M.coordwise_error, ref_errors.coordwise_error),
        ]:
            ours = ours_fn(jnp.asarray(PRED), jnp.asarray(TARGET), mode)
            ref = ref_fn(t(PRED), t(TARGET), mode)
            np.testing.assert_allclose(
                np.asarray(ours), ref.numpy(), rtol=2e-5, atol=1e-6
            )

    @pytest.mark.parametrize("signed", [True, False])
    def test_segments_len_err(self, signed):
        ours = M.segments_len_err(
            jnp.asarray(PRED), jnp.asarray(TARGET), SKEL, "average", signed
        )
        # reference layout (B, 3, J, L)
        ref = ref_errors.segments_len_err(
            t(PRED).permute(0, 3, 2, 1), t(TARGET).permute(0, 3, 2, 1),
            REF_SKEL, "average", signed
        )
        np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-5)

    def test_p_mpjpe(self):
        ours = M.p_mpjpe(jnp.asarray(PRED), jnp.asarray(TARGET))
        ref = ref_errors.p_mpjpe(t(PRED), t(TARGET))
        np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4)


class TestConsistency:
    def ref_layout(self, x):
        return t(x).permute(0, 3, 2, 1)  # (B,L,J,3) -> (B,3,J,L)

    def test_measure_bones_length(self):
        ours = M.measure_bones_length(jnp.asarray(PRED), SKEL)
        ref_utils = load_ref_module("mh_so3_hpe.metrics.utils")
        ref = ref_utils.measure_bones_length(self.ref_layout(PRED), REF_SKEL.bones)
        # ref (B, S, L) vs ours (B, L, S)
        np.testing.assert_allclose(
            np.asarray(ours), ref.permute(0, 2, 1).numpy(), rtol=1e-5
        )

    @pytest.mark.parametrize("mode", ["average", "sum", "std"])
    def test_mpsce(self, mode):
        ours = M.segments_time_consistency(jnp.asarray(PRED), SKEL, mode)
        ref = ref_reg.segments_time_consistency(
            self.ref_layout(PRED), REF_SKEL, mode
        )
        np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-4)

    def test_mpsce_per_bone(self):
        ours = M.segments_time_consistency_per_bone(jnp.asarray(PRED), SKEL, "std")
        ref = ref_reg.segments_time_consistency_per_bone(
            self.ref_layout(PRED), REF_SKEL, "std"
        )
        np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-4)

    @pytest.mark.parametrize("squared", [True, False])
    def test_mpsse(self, squared):
        ours = M.sagittal_symmetry(jnp.asarray(PRED), SKEL, "average", squared)
        ref = ref_reg.sagittal_symmetry(
            self.ref_layout(PRED), REF_SKEL, "average", squared
        )
        np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-4)

    def test_mpsse_per_bone(self):
        ours = M.sagittal_symmetry_per_bone(jnp.asarray(PRED), SKEL, "average")
        ref = ref_reg.sagittal_symmetry_per_bone(
            self.ref_layout(PRED), REF_SKEL, "average"
        )
        np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-4)

    def test_max_stretch(self):
        lo, hi = M.segments_max_stretch_per_bone(jnp.asarray(PRED), SKEL)
        rlo, rhi = ref_reg.segments_max_strech_per_bone(
            self.ref_layout(PRED), REF_SKEL
        )
        np.testing.assert_allclose(np.asarray(lo), rlo.numpy(), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(hi), rhi.numpy(), rtol=1e-5)

    def test_max_diff_stretch(self):
        vals, _ = M.segments_max_diff_stretch_per_bone(jnp.asarray(PRED), SKEL)
        ref_vals, _ = ref_reg.segments_max_diff_strech_per_bone(
            self.ref_layout(PRED), REF_SKEL
        )
        np.testing.assert_allclose(np.asarray(vals), ref_vals.numpy(), rtol=1e-5)

    @pytest.mark.parametrize("weights", [None, WEIGHTS])
    def test_smoothness(self, weights):
        ours = M.smoothness_regularization(
            jnp.asarray(PRED), None if weights is None else jnp.asarray(weights)
        )
        ref = ref_reg.smoothness_regularization(
            t(PRED), None if weights is None else t(weights)
        )
        np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-5)


class TestPCK:
    # mm-scale synthetic poses
    GT = (rand(32, 17, 3) * 300).astype(np.float32)
    PR = (GT + rand(32, 17, 3) * 80).astype(np.float32)
    MASK = RNG.uniform(size=(32, 17)) > 0.1

    @pytest.mark.parametrize("alignment", ["none", "scale", "procrustes"])
    def test_pck(self, alignment):
        ours = M.keypoint_3d_pck(
            jnp.asarray(self.PR), jnp.asarray(self.GT),
            jnp.asarray(self.MASK), alignment
        )
        ref = ref_pck.keypoint_3d_pck(self.PR, self.GT, self.MASK, alignment)
        np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-3)

    @pytest.mark.parametrize("alignment", ["none", "scale", "procrustes"])
    def test_auc(self, alignment):
        ours = M.keypoint_3d_auc(
            jnp.asarray(self.PR), jnp.asarray(self.GT),
            jnp.asarray(self.MASK), alignment
        )
        ref = ref_pck.keypoint_3d_auc(self.PR, self.GT, self.MASK, alignment)
        np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-2)
