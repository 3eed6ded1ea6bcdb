"""Parallel layer: mesh construction, sharding rules, and numerical
consistency — a dp x tp sharded train step must produce the same numbers
as the unsharded one (XLA collectives only change the schedule)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from manipose_tpu.geometry import h36m_skeleton_17
from manipose_tpu.models import ManifoldConfig, RMCLManifoldMixSTE
from manipose_tpu.parallel import make_mesh, param_spec, shard_batch, shard_params
from manipose_tpu.train import LossConfig, TrainState, make_optimizer, make_train_step

SKEL = h36m_skeleton_17()
L = 9

CFG = ManifoldConfig(
    num_frame=L, embed_dim_rot=32, depth_rot=2, num_heads_rot=4,
    embed_dim_seg=16, depth_seg=2, num_heads_seg=4, n_hyp=2,
    drop_path_rate=0.0,
)


def _data(batch):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(batch, L, 17, 2)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(batch, L, 17, 3)).astype(np.float32))
    return x, y


class TestMesh:
    def test_make_mesh_shapes(self):
        mesh = make_mesh(data=4, model=2)
        assert mesh.shape == {"data": 4, "model": 2}
        assert make_mesh(data=8).shape == {"data": 8, "model": 1}

    def test_param_spec_rules(self):
        assert param_spec("x/attn/qkv/kernel") == P(None, "model")
        assert param_spec("x/attn/proj/kernel") == P("model", None)
        assert param_spec("x/mlp/fc1/bias") == P("model")
        assert param_spec("x/norm1/scale") == P()
        assert param_spec("spatial_pos_embed") == P()


class TestShardedNumericalConsistency:
    def test_sharded_step_matches_single_device(self):
        """One train step on a 4x2 dp x tp mesh == one unsharded step."""
        model = RMCLManifoldMixSTE(CFG, SKEL)
        x, y = _data(8)
        params = model.init(jax.random.PRNGKey(0), x[:1])
        tx = make_optimizer(weight_decay=1e-6)
        step = make_train_step(
            model.apply, LossConfig(rmcl=True), SKEL, tx, donate=False
        )

        # single device
        state1 = TrainState.create(params, tx, jax.random.PRNGKey(1))
        state1, m1 = step(state1, x, y, 1e-3)
        state1, m1b = step(state1, x, y, 1e-3)

        # sharded
        mesh = make_mesh(data=4, model=2)
        with mesh:
            sharded_params = shard_params(params, mesh)
            state2 = TrainState.create(sharded_params, tx, jax.random.PRNGKey(1))
            xs, ys = shard_batch((x, y), mesh)
            state2, m2 = step(state2, xs, ys, 1e-3)
            state2, m2b = step(state2, xs, ys, 1e-3)

        np.testing.assert_allclose(
            float(m1["loss"]), float(m2["loss"]), rtol=1e-5
        )
        np.testing.assert_allclose(
            float(m1b["loss"]), float(m2b["loss"]), rtol=1e-4
        )
        # gradients identical (Adam-updated params are ill-conditioned to
        # compare: near-zero grads get sign-normalized to +-lr, so fp
        # reduction-order noise flips them)
        from manipose_tpu.train import compute_loss

        def loss_fn(p, x, y):
            pred = model.apply(p, x, deterministic=True)
            return compute_loss(pred, y, LossConfig(rmcl=True), SKEL)[0]

        g1 = jax.jit(jax.grad(loss_fn))(params, x, y)
        with mesh:
            g2 = jax.jit(jax.grad(loss_fn))(sharded_params, xs, ys)
        for a, b in zip(
            jax.tree_util.tree_leaves(g1),
            jax.tree_util.tree_leaves(jax.device_get(g2)),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-4
            )

    def test_eval_sharded_matches(self):
        model = RMCLManifoldMixSTE(CFG, SKEL)
        x, _ = _data(8)
        params = model.init(jax.random.PRNGKey(0), x[:1])
        poses1, scores1 = model.apply(params, x)

        mesh = make_mesh(data=4, model=2)
        with mesh:
            sp = shard_params(params, mesh)
            (xs,) = shard_batch((x,), mesh)
            poses2, scores2 = jax.jit(
                lambda p, x: model.apply(p, x, deterministic=True)
            )(sp, xs)
        # fp reduction-order noise through the FK chain: tolerate 2e-4 m
        # (0.2 mm, far below metric significance)
        np.testing.assert_allclose(
            np.asarray(poses1), np.asarray(poses2), atol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(scores1), np.asarray(scores2), atol=1e-5
        )
