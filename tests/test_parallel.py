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


class TestFSDP:
    def test_fsdp_spec_shards_largest_free_axis(self):
        from manipose_tpu.parallel.mesh import fsdp_param_spec

        # plain 2D kernel (in=32, out=96): largest axis 96 -> data
        assert fsdp_param_spec("x/some/kernel", (32, 96), 4) == P(None, "data")
        # TP already owns out -> data goes on in
        assert fsdp_param_spec("x/attn/qkv/kernel", (32, 96), 4) == P("data", "model")
        # bias under TP stays model-sharded; no free divisible axis left
        assert fsdp_param_spec("x/attn/qkv/bias", (96,), 4) == P("model")
        # small vector not divisible -> replicated
        assert fsdp_param_spec("x/norm/scale", (17,), 4) == P()
        # data axis of size 1 -> pure TP
        assert fsdp_param_spec("x/some/kernel", (32, 96), 1) == P()

    def test_fsdp_step_matches_single_device(self):
        """ZeRO-3 param sharding must not change the numbers."""
        model = RMCLManifoldMixSTE(CFG, SKEL)
        x, y = _data(8)
        params = model.init(jax.random.PRNGKey(0), x[:1])
        tx = make_optimizer(weight_decay=1e-6)
        step = make_train_step(
            model.apply, LossConfig(rmcl=True), SKEL, tx, donate=False
        )
        state1 = TrainState.create(params, tx, jax.random.PRNGKey(1))
        state1, m1 = step(state1, x, y, 1e-3)

        mesh = make_mesh(data=4, model=2)
        with mesh:
            fsdp_params = shard_params(params, mesh, mode="fsdp")
            state2 = TrainState.create(fsdp_params, tx, jax.random.PRNGKey(1))
            xs, ys = shard_batch((x, y), mesh)
            state2, m2 = step(state2, xs, ys, 1e-3)
        np.testing.assert_allclose(
            float(m1["loss"]), float(m2["loss"]), rtol=1e-5
        )
        # params actually sharded over data: check one trunk kernel's
        # sharding carries the 'data' axis
        leaves = jax.tree_util.tree_flatten_with_path(state2.params)[0]
        specs = {
            jax.tree_util.keystr(p, simple=True, separator="/"):
            v.sharding.spec for p, v in leaves if hasattr(v, "sharding")
        }
        qkv = [s for k, s in specs.items() if k.endswith("attn/qkv/kernel")]
        assert qkv and all("data" in str(s) for s in qkv), qkv[:2]


class TestGradAccumulation:
    def test_accumulated_step_matches_full_batch(self):
        """accum_steps=4 over B=8 == one full-batch step (deterministic
        loss path; dropout disabled via drop rates = 0)."""
        model = RMCLManifoldMixSTE(CFG, SKEL)
        x, y = _data(8)
        params = model.init(jax.random.PRNGKey(0), x[:1])
        tx = make_optimizer(weight_decay=1e-6)

        step_full = make_train_step(
            model.apply, LossConfig(rmcl=True), SKEL, tx, donate=False
        )
        step_accum = make_train_step(
            model.apply, LossConfig(rmcl=True), SKEL, tx, donate=False,
            accum_steps=4,
        )
        s1 = TrainState.create(params, tx, jax.random.PRNGKey(1))
        s2 = TrainState.create(params, tx, jax.random.PRNGKey(1))
        s1, m1 = step_full(s1, x, y, 1e-3)
        s2, m2 = step_accum(s2, x, y, 1e-3)
        # WTA/BCE losses are per-sample means -> microbatch means average
        # exactly to the full-batch mean (equal microbatch sizes)
        np.testing.assert_allclose(
            float(m1["loss"]), float(m2["loss"]), rtol=1e-5
        )
        for a, b in zip(
            jax.tree_util.tree_leaves(s1.params),
            jax.tree_util.tree_leaves(s2.params),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-3
            )

    def test_accum_on_mesh(self):
        """Grad accumulation composes with dp x tp sharding."""
        model = RMCLManifoldMixSTE(CFG, SKEL)
        x, y = _data(8)
        params = model.init(jax.random.PRNGKey(0), x[:1])
        tx = make_optimizer(weight_decay=1e-6)
        step = make_train_step(
            model.apply, LossConfig(rmcl=True), SKEL, tx, donate=False,
            accum_steps=2,
        )
        mesh = make_mesh(data=4, model=2)
        with mesh:
            sp = shard_params(params, mesh, mode="fsdp")
            state = TrainState.create(sp, tx, jax.random.PRNGKey(1))
            xs, ys = shard_batch((x, y), mesh)
            state, m = step(state, xs, ys, 1e-3)
        assert np.isfinite(float(m["loss"]))


class TestRingAttention:
    """Sequence/context parallelism: exact attention with the sequence
    axis sharded around the ring (SURVEY §2.8 long-context path)."""

    def _dense(self, q, k, v, scale):
        p = jax.nn.softmax(jnp.einsum("bhnd,bhmd->bhnm", q, k) * scale, -1)
        return jnp.einsum("bhnm,bhmd->bhnd", p, v)

    @pytest.mark.parametrize("ring,n", [(4, 32), (8, 64), (2, 6)])
    def test_matches_dense_attention(self, ring, n):
        from manipose_tpu.parallel import make_mesh, ring_attention

        mesh = make_mesh(data=8 // ring, model=ring)
        rng = np.random.default_rng(0)
        b, h, d = 2, 4, 16
        q, k, v = [
            jnp.asarray(rng.normal(size=(b, h, n, d)).astype(np.float32))
            for _ in range(3)
        ]
        scale = d ** -0.5
        out = ring_attention(q, k, v, scale, mesh, axis="model")
        ref = self._dense(q, k, v, scale)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-6)

    def test_gradients_match_dense(self):
        from manipose_tpu.parallel import make_mesh, ring_attention

        mesh = make_mesh(data=2, model=4)
        rng = np.random.default_rng(1)
        b, h, n, d = 2, 2, 16, 8
        q, k, v = [
            jnp.asarray(rng.normal(size=(b, h, n, d)).astype(np.float32))
            for _ in range(3)
        ]
        scale = d ** -0.5

        def loss_ring(q, k, v):
            return jnp.sum(ring_attention(q, k, v, scale, mesh, "model") ** 2)

        def loss_dense(q, k, v):
            return jnp.sum(self._dense(q, k, v, scale) ** 2)

        g1 = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
        g2 = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
        for a, b_, name in zip(g1, g2, "qkv"):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       atol=5e-6, err_msg=f"d{name}")

    @pytest.mark.parametrize("ring,n", [(4, 10), (8, 243)])
    def test_indivisible_sequence_pads_and_matches(self, ring, n):
        """Sequence lengths that don't divide the ring size are padded
        with masked keys — incl. the flagship L=243 on an 8-way ring
        (n=10, ring=8 additionally covers whole blocks of pure pad)."""
        from manipose_tpu.parallel import make_mesh, ring_attention

        mesh = make_mesh(data=8 // ring, model=ring)
        rng = np.random.default_rng(3)
        b, h, d = 2, 2, 8
        q, k, v = [
            jnp.asarray(rng.normal(size=(b, h, n, d)).astype(np.float32))
            for _ in range(3)
        ]
        scale = d ** -0.5
        out = ring_attention(q, k, v, scale, mesh, axis="model")
        ref = self._dense(q, k, v, scale)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-6)

    def test_flagship_shape_grads_match_dense(self):
        """VERDICT r2 #6: L=243 sharded 8-ways at d=64/heads=8 —
        fwd + q/k/v grad parity vs dense at the real temporal-attention
        shape (the folded batch rides the 'data'=1 axis)."""
        from manipose_tpu.parallel import make_mesh, ring_attention

        mesh = make_mesh(data=1, model=8)
        rng = np.random.default_rng(4)
        b, h, n, d = 2, 8, 243, 64
        q, k, v = [
            jnp.asarray(rng.normal(size=(b, h, n, d)).astype(np.float32))
            for _ in range(3)
        ]
        scale = d ** -0.5

        def loss_ring(q, k, v):
            return jnp.sum(
                ring_attention(q, k, v, scale, mesh, "model") ** 2
            )

        def loss_dense(q, k, v):
            return jnp.sum(self._dense(q, k, v, scale) ** 2)

        out = ring_attention(q, k, v, scale, mesh, "model")
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(self._dense(q, k, v, scale)),
            atol=5e-6,
        )
        g1 = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
        g2 = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
        for a, b_, name in zip(g1, g2, "qkv"):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       atol=2e-5, err_msg=f"d{name}")

    def test_flagship_model_ring_matches_xla(self):
        """model.attn_impl=ring end-to-end: the full rMCL flagship
        forward on a dp x ring mesh matches the single-device xla path."""
        import dataclasses

        from manipose_tpu.parallel import RingSpec, make_mesh

        mesh = make_mesh(data=2, model=4)
        rcfg = dataclasses.replace(
            CFG,
            attn_impl="ring",
            ring=RingSpec(mesh=mesh, axis="model", batch_axis="data"),
        )
        m_xla = RMCLManifoldMixSTE(CFG, SKEL)
        m_ring = RMCLManifoldMixSTE(rcfg, SKEL)
        x, _ = _data(4)
        params = m_xla.init(jax.random.PRNGKey(0), x[:1])
        p1, s1 = m_xla.apply(params, x)
        with mesh:
            (xs,) = shard_batch((x,), mesh)
            p2, s2 = jax.jit(
                lambda p, x: m_ring.apply(p, x, deterministic=True)
            )(params, xs)
        np.testing.assert_allclose(
            np.asarray(p1), np.asarray(p2), atol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(s1), np.asarray(s2), atol=1e-5
        )
