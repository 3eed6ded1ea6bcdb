"""Model stack: shapes, manifold invariants, aggregation parity, params."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from manipose_tpu.geometry import h36m_skeleton_17
from manipose_tpu.models import (
    ManifoldConfig,
    ManifoldMixSTE,
    MixSTE,
    MixSTEConfig,
    RMCLManifoldMixSTE,
    aggregate_hypotheses,
    concat_hyp_and_scores,
    poses_from_hyp_idx,
)

SKEL = h36m_skeleton_17()
B, L, J, H = 2, 9, 17, 3

SMALL = ManifoldConfig(
    num_frame=L,
    num_joints=J,
    num_bones=16,
    embed_dim_rot=32,
    depth_rot=2,
    num_heads_rot=4,
    embed_dim_seg=16,
    depth_seg=2,
    num_heads_seg=4,
    n_hyp=H,
)


def _x():
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.normal(size=(B, L, J, 2)).astype(np.float32))


class TestMixSTE:
    def test_forward_shape(self):
        cfg = MixSTEConfig(
            num_frame=L, num_joints=J, embed_dim=32, depth=2, num_heads=4
        )
        model = MixSTE(cfg)
        params = model.init(jax.random.PRNGKey(0), _x())
        out = model.apply(params, _x())
        assert out.shape == (B, L, J, 3)
        assert bool(jnp.isfinite(out).all())

    def test_param_count_full_size(self):
        """Reference MixSTE @ d=512, depth=8 has ~33.78M params
        (cf. useful_aux_scripts/count_n_params.py — "~33.7M")."""
        cfg = MixSTEConfig()
        model = MixSTE(cfg)
        x = jnp.zeros((1, 243, 17, 2))
        params = model.init(jax.random.PRNGKey(0), x)
        n = sum(p.size for p in jax.tree.leaves(params))
        # Analytic torch count: 16 blocks + embeds + shared norms + head
        per_block = (
            2 * 512  # norm1
            + 512 * 1536 + 1536  # qkv
            + 512 * 512 + 512  # proj
            + 2 * 512  # norm2
            + 512 * 1024 + 1024  # fc1
            + 1024 * 512 + 512  # fc2
        )
        expected = (
            16 * per_block
            + (2 * 512 + 512)  # spatial embed
            + (17 + 243) * 512  # pos embeds
            + 2 * (2 * 512)  # shared norms
            + 2 * 512  # head norm
            + 512 * 3 + 3  # head linear
        )
        assert n == expected, (n, expected)
        assert abs(n - 33.7e6) / 33.7e6 < 0.01

    def test_dropout_train_vs_eval(self):
        cfg = MixSTEConfig(
            num_frame=L, num_joints=J, embed_dim=32, depth=2, num_heads=4,
            drop_path_rate=0.5, drop_rate=0.1,
        )
        model = MixSTE(cfg)
        params = model.init(jax.random.PRNGKey(0), _x())
        eval_out = model.apply(params, _x(), deterministic=True)
        eval_out2 = model.apply(params, _x(), deterministic=True)
        np.testing.assert_array_equal(np.asarray(eval_out), np.asarray(eval_out2))
        train_out = model.apply(
            params, _x(), deterministic=False,
            rngs={"dropout": jax.random.PRNGKey(1)},
        )
        assert not np.allclose(np.asarray(eval_out), np.asarray(train_out))


class TestManifold:
    def test_forward_and_manifold_property(self):
        model = ManifoldMixSTE(SMALL, SKEL)
        params = model.init(jax.random.PRNGKey(0), _x())
        poses = model.apply(params, _x())
        assert poses.shape == (B, L, J, 3)
        # root pinned to origin
        np.testing.assert_array_equal(np.asarray(poses[..., 0, :]), 0.0)
        # bone lengths constant across time (manifold constraint)
        from manipose_tpu.metrics import measure_bones_length

        lengths = np.asarray(measure_bones_length(poses, SKEL))  # (B, L, S)
        np.testing.assert_allclose(
            lengths, np.broadcast_to(lengths[:, :1], lengths.shape), atol=1e-5
        )


class TestSegHeadsOption:
    """model.nheads_seg is the documented-divergence fast segments
    branch (BASELINE.md r3 study: the reference's 8-head/d_head=16
    structure costs ~8 ms/step purely from the head split). The knob
    must reach the model, keep the param tree identical (the split is a
    reshape, not a shape change), and keep every manifold invariant."""

    def test_nheads_seg_reaches_model_and_preserves_structure(self):
        import dataclasses

        from manipose_tpu.metrics import measure_bones_length

        cfg2 = dataclasses.replace(SMALL, num_heads_seg=2)
        m8 = ManifoldMixSTE(SMALL, SKEL)
        m2 = ManifoldMixSTE(cfg2, SKEL)
        assert m2.cfg.num_heads_seg == 2
        p8 = m8.init(jax.random.PRNGKey(0), _x())
        p2 = m2.init(jax.random.PRNGKey(0), _x())
        # identical param trees: only the in-kernel head split differs
        assert jax.tree_util.tree_structure(p8) == (
            jax.tree_util.tree_structure(p2)
        )
        for a, b in zip(
            jax.tree_util.tree_leaves(p8), jax.tree_util.tree_leaves(p2)
        ):
            assert a.shape == b.shape
        poses = m2.apply(p2, _x())
        assert poses.shape == (B, L, J, 3)
        assert np.isfinite(np.asarray(poses)).all()
        lengths = np.asarray(measure_bones_length(poses, SKEL))
        np.testing.assert_allclose(
            lengths, np.broadcast_to(lengths[:, :1], lengths.shape),
            atol=1e-5,
        )
        # different head split => genuinely different attention math
        # (same params on purpose: the divergence is real, not a no-op)
        out8 = np.asarray(m8.apply(p8, _x()))
        out2 = np.asarray(m2.apply(p8, _x()))
        assert np.abs(out8 - out2).max() > 1e-6

    def test_config_knob_reaches_driver_model(self):
        from manipose_tpu.config import load_config
        from manipose_tpu.drivers.common import instantiate_model

        cfg = load_config(overrides=[
            "model.nheads_seg=2", f"data.seq_len={L}",
            "model.channels=32", "model.layers=2", "model.nheads=4",
            "model.channels_seg=16", "model.layers_seg=2",
        ])
        model, rmcl = instantiate_model(cfg, SKEL)
        assert rmcl and model.cfg.num_heads_seg == 2


class TestRMCL:
    def _model(self):
        model = RMCLManifoldMixSTE(SMALL, SKEL)
        params = model.init(jax.random.PRNGKey(0), _x())
        return model, params

    def test_forward_shapes_scores_softmax(self):
        model, params = self._model()
        poses, scores = model.apply(params, _x())
        assert poses.shape == (B, H, L, J, 3)
        assert scores.shape == (B, H, L, 1)
        np.testing.assert_allclose(
            np.asarray(jnp.sum(scores, axis=1)), 1.0, atol=1e-5
        )

    def test_shared_bone_lengths_across_hypotheses(self):
        model, params = self._model()
        poses, _ = model.apply(params, _x())
        from manipose_tpu.metrics import measure_bones_length

        lengths = np.asarray(measure_bones_length(poses, SKEL))  # (B,H,L,S)
        np.testing.assert_allclose(
            lengths,
            np.broadcast_to(lengths[:, :1, :1], lengths.shape),
            atol=1e-5,
        )

    def test_mcl_heads_match_per_head_loop(self):
        """Fused stacked-head einsum == naive per-head LayerNorm+Linear."""
        from manipose_tpu.models import MCLHeads

        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(B, L, J, 24)).astype(np.float32))
        heads = MCLHeads(n_hyp=H, embed_dim=24, out_dim=6, num_joints=J)
        params = heads.init(jax.random.PRNGKey(2), x)
        # randomize LN affine so the fold is actually exercised
        p = jax.tree.map(lambda a: a, params)
        p["params"]["ln_scale"] = jnp.asarray(
            rng.normal(1.0, 0.3, size=(H, 24)).astype(np.float32)
        )
        p["params"]["ln_bias"] = jnp.asarray(
            rng.normal(0.0, 0.3, size=(H, 24)).astype(np.float32)
        )
        preds, logits = heads.apply(p, x)

        pp = p["params"]
        for h in range(H):
            mean = np.mean(np.asarray(x), axis=-1, keepdims=True)
            var = np.var(np.asarray(x), axis=-1, keepdims=True)
            x_hat = (np.asarray(x) - mean) / np.sqrt(var + 1e-5)
            y = x_hat * np.asarray(pp["ln_scale"][h]) + np.asarray(pp["ln_bias"][h])
            out = y @ np.asarray(pp["pred_kernel"][h]) + np.asarray(pp["pred_bias"][h])
            np.testing.assert_allclose(
                np.asarray(preds[:, h]), out[..., :-1], atol=2e-5
            )
            score_emb = out[..., -1]
            logit = score_emb @ np.asarray(pp["score_kernel"][h]) + np.asarray(
                pp["score_bias"][h]
            )
            np.testing.assert_allclose(
                np.asarray(logits[:, h]), logit, atol=2e-5
            )


class TestAggregation:
    rng = np.random.default_rng(3)
    HYPS = rng.normal(size=(B, H, L, J, 3)).astype(np.float32)
    LOGITS = rng.normal(size=(B, H, L, 1)).astype(np.float32)
    SCORES = np.exp(LOGITS) / np.exp(LOGITS).sum(axis=1, keepdims=True)
    GT = rng.normal(size=(B, L, J, 3)).astype(np.float32)

    def test_weighted_ave(self):
        out = aggregate_hypotheses(
            jnp.asarray(self.HYPS), jnp.asarray(self.SCORES), "weighted_ave"
        )
        ref = np.sum(self.HYPS * self.SCORES[..., None], axis=1)
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-6)

    def test_best_score(self):
        out = aggregate_hypotheses(
            jnp.asarray(self.HYPS), jnp.asarray(self.SCORES), "best_score"
        )
        idx = np.argmax(self.SCORES, axis=1)[..., 0]  # (B, L)
        ref = np.stack(
            [
                np.stack([self.HYPS[b, idx[b, l], l] for l in range(L)])
                for b in range(B)
            ]
        )
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-6)

    def test_oracle(self):
        mpjpe, out = aggregate_hypotheses(
            jnp.asarray(self.HYPS), ground_truth=jnp.asarray(self.GT), mode="oracle"
        )
        # winner = argmin unweighted per-(B,L) mean joint error
        err = np.linalg.norm(
            self.HYPS - self.GT[:, None], axis=-1
        ).mean(-1)  # (B, H, L)
        idx = np.argmin(err, axis=1)
        np.testing.assert_allclose(np.asarray(mpjpe), err.min(axis=1), rtol=1e-5)
        ref = np.stack(
            [
                np.stack([self.HYPS[b, idx[b, l], l] for l in range(L)])
                for b in range(B)
            ]
        )
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-6)

    def test_concat_hyp_and_scores(self):
        out = concat_hyp_and_scores(
            jnp.asarray(self.HYPS), jnp.asarray(self.SCORES)
        )
        assert out.shape == (B, H, L, J, 4)
        np.testing.assert_allclose(
            np.asarray(out[..., 3]),
            np.broadcast_to(self.SCORES, (B, H, L, J)),
            atol=1e-6,
        )

    def test_poses_from_hyp_idx(self):
        idx = jnp.asarray(self.rng.integers(0, H, size=(B, L)))
        out = poses_from_hyp_idx(jnp.asarray(self.HYPS), idx)
        assert out.shape == (B, L, J, 3)
        for b in range(B):
            for l in range(L):
                np.testing.assert_array_equal(
                    np.asarray(out[b, l]), self.HYPS[b, int(idx[b, l]), l]
                )
