"""Composite-training-loss parity vs the reference make_loss /
compute_and_acc_loss pipeline, and data-windowing parity vs the
reference PoseSequenceGenerator."""

import sys
import types
from collections import defaultdict

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from manipose_tpu.train import LossConfig, compute_loss
from manipose_tpu.geometry import h36m_skeleton_17

from conftest import install_driver_stubs, load_ref_module
from test_geometry import _reference_h36m_17

ref_rmcl_mod = install_driver_stubs()
ref_main = load_ref_module("main_h36m_lifting")

B, H, L, J = 3, 2, 9, 17
SKEL = h36m_skeleton_17()
REF_SKEL = _reference_h36m_17()


def _cfg_train(**overrides):
    base = dict(
        sq_loss=False, w_loss=True, vel_loss=2.0, smooth_reg=0.5,
        rmcl_score_reg=0.1, rigid_seg_reg=0.0, lat_sym_regularization=0.0,
    )
    base.update(overrides)
    return types.SimpleNamespace(**base)


class _FakeRMCL(ref_rmcl_mod.RMCLManifoldMixSTE):
    """isinstance-compatible stand-in; never actually called."""

    def __init__(self):  # noqa: D401 - bypass heavy construction
        torch.nn.Module.__init__(self)


@pytest.mark.parametrize(
    "overrides",
    [
        {},
        {"sq_loss": True},
        {"vel_loss": 0.0, "smooth_reg": 0.0},
    ],
)
def test_rmcl_composite_loss_matches_reference(overrides):
    rng = np.random.default_rng(0)
    poses = rng.normal(size=(B, H, L, J, 3)).astype(np.float32)
    logits = rng.normal(size=(B, H, L, 1)).astype(np.float32)
    scores = np.asarray(torch.from_numpy(logits).softmax(dim=1))
    target = rng.normal(size=(B, L, J, 3)).astype(np.float32)

    cfg_train = _cfg_train(**overrides)
    loss_terms = ref_main.make_loss(cfg_train, _FakeRMCL(), skeleton=REF_SKEL)
    acc = defaultdict(int)
    ref_total = ref_main.compute_and_acc_loss(
        prediction=(torch.from_numpy(poses), torch.from_numpy(scores)),
        y=torch.from_numpy(target),
        loss_terms=loss_terms,
        avg_loss_terms=acc,
        rmcl=True,
    )

    cfg = LossConfig(
        sq_loss=cfg_train.sq_loss,
        w_loss=cfg_train.w_loss,
        vel_loss=cfg_train.vel_loss,
        smooth_reg=cfg_train.smooth_reg,
        rmcl_score_reg=cfg_train.rmcl_score_reg,
        rigid_seg_reg=cfg_train.rigid_seg_reg,
        rmcl=True,
    )
    total, terms = compute_loss(
        (jnp.asarray(poses), jnp.asarray(scores)), jnp.asarray(target),
        cfg, SKEL,
    )
    np.testing.assert_allclose(
        float(total), float(ref_total), rtol=1e-5,
        err_msg=f"composite loss mismatch for {overrides}",
    )
    # per-term logging values match too
    for name, val in acc.items():
        assert name in terms, (name, list(terms))
        np.testing.assert_allclose(
            float(terms[name]), val, rtol=1e-4, err_msg=name
        )


@pytest.mark.parametrize(
    "overrides", [{"rmcl_score_reg": 0.0}, {"w_loss": False}]
)
def test_rmcl_configs_broken_in_reference_work_here(overrides):
    """Two rMCL loss configs CRASH in the reference and work here:
    - rmcl_score_reg=0: its score_reg term unpacks the beta=0 scalar
      return of wta_with_scoring_loss (losses.py:155-156 vs
      main_h36m_lifting.py:139-149)
    - w_loss=False (+smooth_reg>0): its weights=None fallback builds a
      wrong-shaped ones tensor for 5-dim rMCL predictions
      (regularizations.py:167-170)."""
    rng = np.random.default_rng(3)
    poses = rng.normal(size=(B, H, L, J, 3)).astype(np.float32)
    logits = rng.normal(size=(B, H, L, 1)).astype(np.float32)
    scores = np.asarray(torch.from_numpy(logits).softmax(dim=1))
    target = rng.normal(size=(B, L, J, 3)).astype(np.float32)

    cfg_train = _cfg_train(**overrides)
    loss_terms = ref_main.make_loss(cfg_train, _FakeRMCL(), skeleton=REF_SKEL)
    with pytest.raises((AssertionError, TypeError, RuntimeError, ValueError)):
        ref_main.compute_and_acc_loss(
            prediction=(torch.from_numpy(poses), torch.from_numpy(scores)),
            y=torch.from_numpy(target),
            loss_terms=loss_terms,
            avg_loss_terms=defaultdict(int),
            rmcl=True,
        )

    cfg = LossConfig(
        sq_loss=cfg_train.sq_loss, w_loss=cfg_train.w_loss,
        vel_loss=cfg_train.vel_loss, smooth_reg=cfg_train.smooth_reg,
        rmcl_score_reg=cfg_train.rmcl_score_reg,
        rigid_seg_reg=cfg_train.rigid_seg_reg, rmcl=True,
    )
    total, _ = compute_loss(
        (jnp.asarray(poses), jnp.asarray(scores)), jnp.asarray(target),
        cfg, SKEL,
    )
    assert np.isfinite(float(total))


@pytest.mark.parametrize("overrides", [{}, {"sq_loss": True}])
def test_single_hyp_composite_loss_matches_reference(overrides):
    rng = np.random.default_rng(1)
    pred = rng.normal(size=(B, L, J, 3)).astype(np.float32)
    target = rng.normal(size=(B, L, J, 3)).astype(np.float32)

    cfg_train = _cfg_train(**overrides)
    loss_terms = ref_main.make_loss(
        cfg_train, torch.nn.Linear(1, 1), skeleton=REF_SKEL
    )
    acc = defaultdict(int)
    ref_total = ref_main.compute_and_acc_loss(
        prediction=torch.from_numpy(pred),
        y=torch.from_numpy(target),
        loss_terms=loss_terms,
        avg_loss_terms=acc,
        rmcl=False,
    )

    cfg = LossConfig(
        sq_loss=cfg_train.sq_loss, w_loss=cfg_train.w_loss,
        vel_loss=cfg_train.vel_loss, smooth_reg=cfg_train.smooth_reg,
        rmcl_score_reg=cfg_train.rmcl_score_reg,
        rigid_seg_reg=cfg_train.rigid_seg_reg, rmcl=False,
    )
    total, _ = compute_loss(jnp.asarray(pred), jnp.asarray(target), cfg, SKEL)
    np.testing.assert_allclose(float(total), float(ref_total), rtol=1e-5)


def test_sequential_windowing_matches_reference_generator():
    """Our PoseSequenceDataset (sequential mode, no aug) item-for-item
    against the reference PoseSequenceGenerator."""
    from manipose_tpu.data import PoseSequenceDataset

    ref_gen_mod = load_ref_module("mh_so3_hpe.data.generators")
    rng = np.random.default_rng(2)
    p3 = [rng.normal(size=(n, J, 3)).astype(np.float32) for n in (40, 25)]
    p2 = [rng.normal(size=(n, J, 2)).astype(np.float32) for n in (40, 25)]

    ref_gen = ref_gen_mod.PoseSequenceGenerator(
        [v.copy() for v in p3], [v.copy() for v in p2], None,
        seq_len=9, random_start=False, miss_type="no_miss",
    )
    ours = PoseSequenceDataset(p3, p2, seq_len=9, random_start=False)
    assert len(ours) == len(ref_gen)
    for i in range(len(ours)):
        ref_2d, ref_3d = ref_gen[i]
        our_2d, our_3d = ours.get(i)
        np.testing.assert_array_equal(our_2d, ref_2d.numpy())
        np.testing.assert_array_equal(our_3d, ref_3d.numpy())
