"""Train/eval engine: loss assembly parity, optimizer semantics,
schedulers, a tiny end-to-end training run, and the eval loop."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from manipose_tpu.data import Batch, PoseSequenceDataset, SequenceLoader
from manipose_tpu.eval import EvalConfig, evaluate, flip_poses
from manipose_tpu.geometry import h36m_skeleton_17
from manipose_tpu.models import ManifoldConfig, RMCLManifoldMixSTE
from manipose_tpu.train import (
    CosineAnnealingLR,
    LossConfig,
    ReduceLROnPlateau,
    TrainState,
    compute_loss,
    make_optimizer,
    make_train_step,
)

SKEL = h36m_skeleton_17()
B, L, J, H = 2, 9, 17, 3

SMALL = ManifoldConfig(
    num_frame=L, num_joints=J, num_bones=16,
    embed_dim_rot=32, depth_rot=2, num_heads_rot=4,
    embed_dim_seg=16, depth_seg=2, num_heads_seg=4, n_hyp=H,
    drop_path_rate=0.0,
)


def _rmcl():
    model = RMCLManifoldMixSTE(SMALL, SKEL)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, L, J, 2)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)
    return model, params, x


class TestCompositeLoss:
    def test_rmcl_terms_present_and_positive(self):
        model, params, x = _rmcl()
        pred = model.apply(params, x)
        rng = np.random.default_rng(1)
        y = jnp.asarray(rng.normal(size=(B, L, J, 3)).astype(np.float32))
        cfg = LossConfig(rmcl=True)
        total, terms = compute_loss(pred, y, cfg, SKEL)
        assert set(terms) == {"wloss", "score_reg", "vloss", "sreg"}
        np.testing.assert_allclose(
            float(total), sum(float(v) for v in terms.values()), rtol=1e-6
        )

    def test_single_hyp_loss(self):
        rng = np.random.default_rng(2)
        pred = jnp.asarray(rng.normal(size=(B, L, J, 3)).astype(np.float32))
        y = jnp.asarray(rng.normal(size=(B, L, J, 3)).astype(np.float32))
        cfg = LossConfig(rmcl=False, vel_loss=0.0, smooth_reg=0.0)
        total, terms = compute_loss(pred, y, cfg)
        from manipose_tpu.metrics import STANDARD_H36M_WEIGHTS, weighted_mpjpe_loss

        expected = weighted_mpjpe_loss(pred, y, STANDARD_H36M_WEIGHTS)
        np.testing.assert_allclose(float(total), float(expected), rtol=1e-6)


class TestOptim:
    def test_adam_matches_torch_semantics(self):
        """optax chain == torch.optim.Adam(weight_decay=1e-2) on a toy param."""
        w0 = np.asarray([[1.0, -2.0], [0.5, 3.0]], np.float32)
        g = np.asarray([[0.1, 0.2], [-0.3, 0.4]], np.float32)

        tp = torch.nn.Parameter(torch.from_numpy(w0.copy()))
        topt = torch.optim.Adam([tp], lr=1e-3, weight_decay=1e-2)
        for _ in range(5):
            topt.zero_grad()
            tp.grad = torch.from_numpy(g.copy())
            topt.step()

        tx = make_optimizer(weight_decay=1e-2)
        params = {"w": jnp.asarray(w0)}
        opt_state = tx.init(params)
        opt_state.hyperparams["learning_rate"] = jnp.asarray(1e-3)
        for _ in range(5):
            updates, opt_state = tx.update({"w": jnp.asarray(g)}, opt_state, params)
            import optax

            params = optax.apply_updates(params, updates)
        np.testing.assert_allclose(
            np.asarray(params["w"]), tp.detach().numpy(), atol=1e-6
        )

    def test_cosine_matches_torch(self):
        tp = torch.nn.Parameter(torch.zeros(1))
        topt = torch.optim.Adam([tp], lr=4e-5)
        tsched = torch.optim.lr_scheduler.CosineAnnealingLR(
            topt, T_max=10, eta_min=1e-6
        )
        ours = CosineAnnealingLR(4e-5, t_max=10, eta_min=1e-6)
        for _ in range(25):
            np.testing.assert_allclose(
                ours.lr, topt.param_groups[0]["lr"], rtol=1e-5
            )
            tsched.step()
            ours.step()

    def test_plateau_matches_torch(self):
        tp = torch.nn.Parameter(torch.zeros(1))
        topt = torch.optim.Adam([tp], lr=1.0)
        tsched = torch.optim.lr_scheduler.ReduceLROnPlateau(
            topt, mode="min", factor=0.5, patience=2, threshold=0.1, min_lr=0.01
        )
        ours = ReduceLROnPlateau(
            1.0, factor=0.5, patience=2, threshold=0.1, min_lr=0.01
        )
        rng = np.random.default_rng(4)
        metric = 10.0
        for i in range(30):
            metric = metric * float(rng.uniform(0.9, 1.05))
            tsched.step(metric)
            ours.step(metric)
            np.testing.assert_allclose(
                ours.lr, topt.param_groups[0]["lr"], rtol=1e-6, err_msg=f"step {i}"
            )


class TestTrainStep:
    def test_loss_decreases(self):
        model, params, x = _rmcl()
        rng = np.random.default_rng(5)
        y = jnp.asarray(0.1 * rng.normal(size=(B, L, J, 3)).astype(np.float32))
        tx = make_optimizer(weight_decay=1e-6)
        state = TrainState.create(params, tx, jax.random.PRNGKey(1))
        step = make_train_step(
            model.apply, LossConfig(rmcl=True), SKEL, tx, donate=False
        )
        losses = []
        for _ in range(8):
            state, metrics = step(state, x, y, 1e-3)
            losses.append(float(metrics["loss"]))
        assert losses[-1] < losses[0], losses

    def test_grads_flow_to_all_params(self):
        model, params, x = _rmcl()
        rng = np.random.default_rng(6)
        y = jnp.asarray(rng.normal(size=(B, L, J, 3)).astype(np.float32))

        def loss_fn(p):
            pred = model.apply(p, x, deterministic=True)
            total, _ = compute_loss(pred, y, LossConfig(rmcl=True), SKEL)
            return total

        grads = jax.grad(loss_fn)(params)
        flat = jax.tree_util.tree_flatten_with_path(grads)[0]
        zero_paths = [
            jax.tree_util.keystr(path)
            for path, g in flat
            if float(jnp.abs(g).max()) == 0.0
        ]
        assert zero_paths == [], f"dead params: {zero_paths}"

    def test_grad_clip_caps_update(self):
        """grad_clip rescales by global norm BEFORE Adam: clipping
        grads of norm 100 to 1 must equal feeding the pre-scaled
        grads."""
        from manipose_tpu.train.optim import set_learning_rate

        model, params, x = _rmcl()
        g_unit = jax.tree_util.tree_map(
            lambda p: jnp.ones_like(p) / 1e3, params
        )
        norm = float(
            jnp.sqrt(
                sum(
                    jnp.sum(g**2)
                    for g in jax.tree_util.tree_leaves(g_unit)
                )
            )
        )
        g_scaled = jax.tree_util.tree_map(lambda g: g / norm, g_unit)
        g_big = jax.tree_util.tree_map(lambda g: g * 100.0, g_scaled)

        def one_update(tx, grads):
            st = tx.init(params)
            set_learning_rate(st, 1e-3)
            updates, _ = tx.update(grads, st, params)
            return updates

        clipped = one_update(
            make_optimizer(weight_decay=0.0, grad_clip=1.0), g_big
        )
        reference = one_update(make_optimizer(weight_decay=0.0), g_scaled)
        for a, b in zip(
            jax.tree_util.tree_leaves(clipped),
            jax.tree_util.tree_leaves(reference),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-6
            )

    def test_skip_nonfinite_guards_params(self):
        """skip_nonfinite=True: a step whose gradients contain NaN/inf
        leaves params AND Adam moments untouched; the next finite step
        proceeds normally (through the full jitted train step)."""
        model, params, x = _rmcl()
        rng = np.random.default_rng(9)
        y = jnp.asarray(0.1 * rng.normal(size=(B, L, J, 3)).astype(np.float32))
        tx = make_optimizer(weight_decay=1e-6, skip_nonfinite=True)
        state = TrainState.create(params, tx, jax.random.PRNGKey(1))
        step = make_train_step(
            model.apply, LossConfig(rmcl=True), SKEL, tx, donate=False
        )
        x_bad = jnp.asarray(x).at[0, 0, 0, 0].set(jnp.nan)
        state1, m = step(state, x_bad, y, 1e-3)
        assert not np.isfinite(float(m["loss"]))
        for p0, p1 in zip(
            jax.tree_util.tree_leaves(state.params),
            jax.tree_util.tree_leaves(state1.params),
        ):
            np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))
        # a finite step still updates
        state2, m2 = step(state1, x, y, 1e-3)
        assert np.isfinite(float(m2["loss"]))
        changed = any(
            not np.array_equal(np.asarray(a), np.asarray(b))
            for a, b in zip(
                jax.tree_util.tree_leaves(state1.params),
                jax.tree_util.tree_leaves(state2.params),
            )
        )
        assert changed

    def test_megastep_skips_nonfinite_inner_step(self):
        """skip_nonfinite composes with the megastep: a NaN batch in
        the middle of the scan leaves params untouched for THAT inner
        step while the surrounding steps still update (the
        apply_if_finite state rides the scan carry)."""
        from manipose_tpu.train import make_multi_train_step

        K = 3
        model, params, x = _rmcl()
        rng = np.random.default_rng(13)
        xs = np.stack([np.asarray(x)] * K).astype(np.float32)
        xs[1, 0, 0, 0, 0] = np.nan  # poison the middle inner step
        ys = 0.1 * rng.normal(size=(K, B, L, J, 3)).astype(np.float32)
        tx = make_optimizer(weight_decay=1e-6, skip_nonfinite=True)
        state = TrainState.create(params, tx, jax.random.PRNGKey(1))
        multi = make_multi_train_step(
            model.apply, LossConfig(rmcl=True), SKEL, tx, n_steps=K,
            donate=False,
        )
        new_state, metrics = multi(
            state, jnp.asarray(xs), jnp.asarray(ys), 1e-3
        )
        losses = np.asarray(metrics["loss"], np.float64)
        assert np.isfinite(losses[0]) and np.isfinite(losses[2])
        assert not np.isfinite(losses[1])
        # the run still produced finite params (step 2 applied on top of
        # step 0's result; the poisoned update was dropped whole)
        for leaf in jax.tree_util.tree_leaves(new_state.params):
            assert np.isfinite(np.asarray(leaf)).all()
        assert int(new_state.step) == K

    def test_megastep_matches_sequential_steps(self):
        """K scan-fused optimizer steps == K single-step dispatches:
        same per-step losses, same final params (identical rng
        threading — split once per inner step)."""
        from manipose_tpu.train import make_multi_train_step

        K = 3
        model, params, x = _rmcl()
        rng = np.random.default_rng(7)
        xs = np.stack(
            [np.asarray(x) + 0.01 * i for i in range(K)]
        ).astype(np.float32)
        ys = 0.1 * rng.normal(size=(K, B, L, J, 3)).astype(np.float32)
        tx = make_optimizer(weight_decay=1e-6)
        cfg = LossConfig(rmcl=True)

        # sequential reference
        state_a = TrainState.create(params, tx, jax.random.PRNGKey(1))
        step = make_train_step(model.apply, cfg, SKEL, tx, donate=False)
        seq_losses = []
        for i in range(K):
            state_a, m = step(
                state_a, jnp.asarray(xs[i]), jnp.asarray(ys[i]), 1e-3
            )
            seq_losses.append(float(m["loss"]))

        # fused megastep
        state_b = TrainState.create(params, tx, jax.random.PRNGKey(1))
        multi = make_multi_train_step(
            model.apply, cfg, SKEL, tx, n_steps=K, donate=False
        )
        state_b, metrics = multi(
            state_b, jnp.asarray(xs), jnp.asarray(ys), 1e-3
        )

        np.testing.assert_allclose(
            np.asarray(metrics["loss"], np.float64), seq_losses, rtol=1e-6
        )
        assert int(state_b.step) == int(state_a.step) == K
        for (pa, ga), (pb, gb) in zip(
            jax.tree_util.tree_flatten_with_path(state_a.params)[0],
            jax.tree_util.tree_flatten_with_path(state_b.params)[0],
        ):
            assert jax.tree_util.keystr(pa) == jax.tree_util.keystr(pb)
            np.testing.assert_allclose(
                np.asarray(ga), np.asarray(gb), atol=1e-6,
                err_msg=jax.tree_util.keystr(pa),
            )
        # rng threading identical -> next dropout keys identical
        np.testing.assert_array_equal(
            np.asarray(state_a.rng), np.asarray(state_b.rng)
        )


class TestEvalEngine:
    def _loader(self):
        rng = np.random.default_rng(7)
        p3 = [rng.normal(size=(4 * L, J, 3)).astype(np.float32)]
        p2 = [rng.normal(size=(4 * L, J, 2)).astype(np.float32)]
        ds = PoseSequenceDataset(p3, p2, seq_len=L)
        return SequenceLoader(ds, batch_size=3, shuffle=False)

    def test_flip_poses_matches_host_flip(self):
        from manipose_tpu.data import pose_flip

        rng = np.random.default_rng(8)
        poses = rng.normal(size=(B, L, J, 3)).astype(np.float32)
        dev = np.asarray(flip_poses(jnp.asarray(poses), SKEL))
        (host,) = pose_flip((poses,), SKEL)
        np.testing.assert_allclose(dev, host, atol=1e-6)

    @pytest.mark.parametrize("tta", [False, True])
    def test_evaluate_rmcl(self, tta):
        model, params, _ = _rmcl()
        cfg = EvalConfig(tta=tta, rmcl=True, compute_oracle=True)
        preds, targets, perf, oracle, psoracle, oracle_preds = evaluate(
            model.apply, params, self._loader(), SKEL, cfg
        )
        total = sum(p.shape[0] for p in preds)
        assert total == 4  # 4 full windows, padding rows dropped
        assert np.isfinite(perf) and perf > 0
        # NOTE: oracle <= perf is NOT guaranteed — the score-weighted
        # average pose can beat every single hypothesis (Jensen).
        assert np.isfinite(oracle) and oracle > 0
        assert np.isfinite(psoracle)

    def test_evaluate_single_hyp(self):
        from manipose_tpu.models import ManifoldMixSTE

        model = ManifoldMixSTE(SMALL, SKEL)
        rng = np.random.default_rng(9)
        x = jnp.asarray(rng.normal(size=(B, L, J, 2)).astype(np.float32))
        params = model.init(jax.random.PRNGKey(0), x)
        cfg = EvalConfig(tta=True, rmcl=False)
        preds, targets, perf = evaluate(
            model.apply, params, self._loader(), SKEL, cfg
        )
        assert np.isfinite(perf)
