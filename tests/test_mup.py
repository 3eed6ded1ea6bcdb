"""muP: readout scaling, optimizer LR rules, and a coordinate check
(activation magnitudes stable across widths — the muP property the
reference validates with useful_aux_scripts/mup_check.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from manipose_tpu.geometry import h36m_skeleton_17
from manipose_tpu.models import MixSTE, MixSTEConfig
from manipose_tpu.train.mup import make_mup_optimizer, mup_lr_scales

SKEL = h36m_skeleton_17()
L, J = 9, 17


def _cfg(width, mup=True):
    return MixSTEConfig(
        num_frame=L, num_joints=J, embed_dim=width, depth=2,
        num_heads=4, mup=mup, mup_base_width=32, drop_path_rate=0.0,
    )


def _x(b=8):
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.normal(size=(b, L, J, 2)).astype(np.float32))


class TestMuP:
    def test_readout_div_applied(self):
        """Head output equals head(norm(trunk)/width_mult) under muP."""
        cfg = _cfg(64)
        assert cfg.readout_div == 2.0
        model = MixSTE(cfg)
        params = model.init(jax.random.PRNGKey(0), _x())
        out_mup = np.asarray(model.apply(params, _x()))

        feats = np.asarray(
            MixSTE(cfg, apply_head=False).apply(params, _x())
        )
        p = params["params"]
        mean = feats.mean(-1, keepdims=True)
        var = feats.var(-1, keepdims=True)
        normed = (feats - mean) / np.sqrt(var + 1e-5)
        normed = normed * np.asarray(p["head_norm"]["scale"]) + np.asarray(
            p["head_norm"]["bias"]
        )
        expected = (normed / 2.0) @ np.asarray(p["head"]["kernel"]) + np.asarray(
            p["head"]["bias"]
        )
        np.testing.assert_allclose(out_mup, expected, atol=1e-5)

    def test_lr_scales_select_matrix_like(self):
        model = MixSTE(_cfg(64))
        params = model.init(jax.random.PRNGKey(0), _x())["params"]
        scales = mup_lr_scales(params, width_mult=2.0)
        flat = {
            jax.tree_util.keystr(path, simple=True, separator="/"): v
            for path, v in jax.tree_util.tree_flatten_with_path(scales)[0]
        }
        assert flat["ste_block_0/attn/qkv/kernel"] == 0.5
        assert flat["ste_block_0/mlp/fc1/kernel"] == 0.5
        assert flat["ste_block_0/attn/qkv/bias"] == 1.0
        assert flat["spatial_embed/kernel"] == 1.0  # fixed fan_in
        assert flat["spatial_pos_embed"] == 1.0  # one infinite dim (J fixed)
        # (L, C) table: two infinite dims under width-seq base shapes
        assert flat["temporal_pos_embed"] == 0.5
        assert flat["head/kernel"] == 1.0  # readout handled in forward

    def test_mcl_head_kernels_keep_full_lr(self):
        """The stacked MCL prediction/score kernels are MuReadout-style:
        the width correction is the forward input division
        (rmcl.py:66-67), so MuAdam must NOT also scale their LR —
        otherwise rMCL head updates shrink by width_mult twice."""
        from manipose_tpu.models import ManifoldConfig, RMCLManifoldMixSTE

        cfg = ManifoldConfig(
            num_frame=L, embed_dim_rot=64, depth_rot=2, num_heads_rot=4,
            embed_dim_seg=16, depth_seg=2, num_heads_seg=4, n_hyp=2,
            mup=True, mup_base_width=32, drop_path_rate=0.0,
        )
        model = RMCLManifoldMixSTE(cfg, SKEL)
        params = model.init(jax.random.PRNGKey(0), _x(2))["params"]
        scales = mup_lr_scales(params, width_mult=2.0)
        flat = {
            jax.tree_util.keystr(path, simple=True, separator="/"): v
            for path, v in jax.tree_util.tree_flatten_with_path(scales)[0]
        }
        pred = [k for k in flat if k.endswith("pred_kernel")]
        score = [k for k in flat if k.endswith("score_kernel")]
        assert pred and score
        assert all(flat[k] == 1.0 for k in pred + score), flat

    @pytest.mark.parametrize("depth", [2, 4])
    def test_coordinate_check_stable_across_width(self, depth):
        """muP coord-check: hidden-activation magnitudes and the per-step
        *change* of the trunk features stay Theta(1) as width grows, at
        two depths (cf. useful_aux_scripts/mup_check.py)."""
        act_mag, delta_mag = self._coord_check(
            [(w, L) for w in (32, 64, 128)], depth=depth
        )
        for name, vals in (("act", act_mag), ("delta", delta_mag)):
            v = list(vals.values())
            assert max(v) < 6 * min(v) + 1e-6, (name, vals)

    def test_coordinate_check_stable_across_seq(self):
        """Fast seq-axis check: Theta(1) activations under seq-only
        scaling (the temporal_pos_embed matrix-like rule,
        train/mup.py)."""
        act_mag, delta_mag = self._coord_check(
            [(64, 9), (64, 27)], depth=2
        )
        for name, vals in (("act", act_mag), ("delta", delta_mag)):
            v = list(vals.values())
            assert max(v) < 6 * min(v) + 1e-6, (name, vals)

    @pytest.mark.slow
    def test_coordinate_check_stable_across_seq_and_width(self):
        """VERDICT r2 #5: the reference's base shapes vary width AND
        seq_len (27->81, ``main_h36m_lifting.py:683-691``) — the
        coord-check must hold along BOTH axes up to the full
        base->delta->target trajectory."""
        for shapes in ([(64, 9), (64, 27), (64, 81)],
                       [(32, 9), (64, 27), (128, 81)]):
            act_mag, delta_mag = self._coord_check(shapes, depth=2)
            for name, vals in (("act", act_mag), ("delta", delta_mag)):
                v = list(vals.values())
                assert max(v) < 6 * min(v) + 1e-6, (name, shapes, vals)

    def _coord_check(self, width_seq_pairs, depth):
        import dataclasses

        import optax

        act_mag, delta_mag = {}, {}
        for width, seq_len in width_seq_pairs:
            cfg = dataclasses.replace(
                _cfg(width), depth=depth, num_frame=seq_len
            )
            model = MixSTE(cfg)
            trunk = MixSTE(cfg, apply_head=False)
            rng = np.random.default_rng(0)
            x = jnp.asarray(
                rng.normal(size=(8, seq_len, J, 2)).astype(np.float32)
            )
            params = model.init(jax.random.PRNGKey(1), x)
            tx = make_mup_optimizer(
                params, width=width, base_width=32, weight_decay=0.0
            )
            opt_state = tx.init(params)
            opt_state.hyperparams["learning_rate"] = jnp.asarray(1e-2)
            feats0 = trunk.apply(params, x)

            def loss_fn(p):
                out = model.apply(p, x)
                return jnp.mean((out - 1.0) ** 2)

            for _ in range(4):
                grads = jax.grad(loss_fn)(params)
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
            feats = trunk.apply(params, x)
            act_mag[(width, seq_len)] = float(jnp.mean(jnp.abs(feats)))
            delta_mag[(width, seq_len)] = float(
                jnp.mean(jnp.abs(feats - feats0))
            )
        return act_mag, delta_mag

    @pytest.mark.slow
    def test_lr_transfer_across_widths(self):
        """The point of muP: the best LR found at the base width stays
        (near-)optimal as width grows 4x (VERDICT r2 #5; artifact curve
        in tools/artifacts/mup_lr_transfer.json / BASELINE.md — same
        protocol: 40 steps, 2 seeds; shorter horizons leave the LR
        optimum too shallow to localize)."""
        import sys
        from pathlib import Path

        sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
        from tools.mup_lr_transfer import lr_transfer

        result = lr_transfer(
            widths=(32, 128), steps=40, mup=True, seeds=(0, 1)
        )
        # applying width-32's best LR at width 128 lands within 15% of
        # width-128's own optimum
        assert result["transfer_gap"] < 0.15, result
        # and the optimum itself moves at most one grid step
        drift = abs(result["best_idx"][32] - result["best_idx"][128])
        assert drift <= 1, result["best_idx"]


class TestMupRobustnessKnobs:
    """model.mup=true must not silently drop train.grad_clip /
    train.skip_nonfinite (review r3: the muP optimizer branch ignored
    both while configs/config.yaml documents them unconditionally)."""

    def _setup(self, **kw):
        import optax

        from manipose_tpu.train.optim import set_learning_rate

        params = {"attn": {"qkv": {"kernel": jnp.ones((4, 4))}},
                  "bias": jnp.zeros(4)}
        tx = make_mup_optimizer(params, width=64, base_width=32,
                                weight_decay=0.0, **kw)
        state = tx.init(params)
        set_learning_rate(state, 1.0)
        return optax, params, tx, state

    def test_skip_nonfinite_skips_nan_steps(self):
        optax, params, tx, state = self._setup(skip_nonfinite=True)
        bad = jax.tree_util.tree_map(
            lambda p: jnp.full_like(p, jnp.nan), params
        )
        updates, state = tx.update(bad, state, params)
        new_params = optax.apply_updates(params, updates)
        for a, b in zip(jax.tree_util.tree_leaves(new_params),
                        jax.tree_util.tree_leaves(params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # a finite step afterwards still applies
        good = jax.tree_util.tree_map(lambda p: jnp.ones_like(p), params)
        updates, state = tx.update(good, state, params)
        moved = optax.apply_updates(params, updates)
        assert not np.allclose(
            np.asarray(jax.tree_util.tree_leaves(moved)[0]),
            np.asarray(jax.tree_util.tree_leaves(params)[0]),
        )

    def test_grad_clip_reaches_the_chain(self):
        # first-step Adam is scale-invariant, so a uniform clip alone is
        # unobservable; with coupled weight decay (added AFTER the clip)
        # a huge negative gradient flips the effective sign only when
        # clipping is active: clip(-1e6) + wd*1 > 0 vs -1e6 + wd*1 < 0
        import optax

        from manipose_tpu.train.optim import set_learning_rate

        params = {"attn": {"qkv": {"kernel": jnp.ones((4, 4))}}}

        def step(grad_clip):
            tx = make_mup_optimizer(params, width=64, base_width=32,
                                    weight_decay=1.0, grad_clip=grad_clip)
            state = tx.init(params)
            set_learning_rate(state, 1.0)
            huge = jax.tree_util.tree_map(
                lambda p: jnp.full_like(p, -1e6), params
            )
            updates, _ = tx.update(huge, state, params)
            return np.asarray(jax.tree_util.tree_leaves(updates)[0])

        assert (step(grad_clip=1e-3) < 0).all()  # decay dominates: descend
        assert (step(grad_clip=0.0) > 0).all()  # raw huge negative grad
