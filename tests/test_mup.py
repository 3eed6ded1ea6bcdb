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
        import dataclasses

        import optax

        act_mag, delta_mag = {}, {}
        for width in (32, 64, 128):
            cfg = dataclasses.replace(_cfg(width), depth=depth)
            model = MixSTE(cfg)
            trunk = MixSTE(cfg, apply_head=False)
            params = model.init(jax.random.PRNGKey(1), _x())
            tx = make_mup_optimizer(
                params, width=width, base_width=32, weight_decay=0.0
            )
            opt_state = tx.init(params)
            opt_state.hyperparams["learning_rate"] = jnp.asarray(1e-2)
            feats0 = trunk.apply(params, _x())

            def loss_fn(p):
                out = model.apply(p, _x())
                return jnp.mean((out - 1.0) ** 2)

            for _ in range(4):
                grads = jax.grad(loss_fn)(params)
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
            feats = trunk.apply(params, _x())
            act_mag[width] = float(jnp.mean(jnp.abs(feats)))
            delta_mag[width] = float(jnp.mean(jnp.abs(feats - feats0)))
        for name, vals in (("act", act_mag), ("delta", delta_mag)):
            v = list(vals.values())
            assert max(v) < 6 * min(v) + 1e-6, (name, vals)
