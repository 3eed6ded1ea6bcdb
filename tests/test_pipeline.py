"""Pipeline parallelism (GPipe over a mesh axis): a pipelined stage
stack must produce the same numbers (and gradients) as applying the
stages sequentially on one device — ppermute/scan only change the
schedule."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from manipose_tpu.parallel import pipeline_apply, stack_stage_params


def _pipe_mesh(stages: int) -> Mesh:
    return Mesh(np.array(jax.devices()[:stages]), ("pipe",))


class TestPipelineMlpStages:
    """Plain dense stages: y = tanh(x @ w + b) per stage."""

    S, B, C = 4, 16, 8

    def _setup(self):
        rng = np.random.default_rng(0)
        params = {
            "w": jnp.asarray(
                rng.normal(size=(self.S, self.C, self.C)).astype(np.float32)
                / np.sqrt(self.C)
            ),
            "b": jnp.asarray(
                rng.normal(size=(self.S, self.C)).astype(np.float32) * 0.1
            ),
        }
        x = jnp.asarray(
            rng.normal(size=(self.B, self.C)).astype(np.float32)
        )
        return params, x

    @staticmethod
    def _stage(p, x):
        return jnp.tanh(x @ p["w"] + p["b"])

    def _sequential(self, params, x):
        for s in range(self.S):
            x = self._stage(
                jax.tree_util.tree_map(lambda p: p[s], params), x
            )
        return x

    @pytest.mark.parametrize("microbatches", [4, 8, 16])
    def test_matches_sequential(self, microbatches):
        params, x = self._setup()
        mesh = _pipe_mesh(self.S)
        out = pipeline_apply(
            self._stage, params, x, mesh, axis="pipe",
            microbatches=microbatches,
        )
        ref = self._sequential(params, x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-6)

    def test_single_stage_degenerates_to_plain_apply(self):
        params, x = self._setup()
        one = jax.tree_util.tree_map(lambda p: p[:1], params)
        mesh = _pipe_mesh(1)
        out = pipeline_apply(self._stage, one, x, mesh, microbatches=4)
        ref = self._stage(
            jax.tree_util.tree_map(lambda p: p[0], one), x
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-6)

    def test_gradients_are_pipelined_backprop(self):
        """grad through the pipeline == grad of the sequential stack,
        for both the params and the input."""
        params, x = self._setup()
        mesh = _pipe_mesh(self.S)

        def loss_pipe(params, x):
            y = pipeline_apply(self._stage, params, x, mesh,
                               microbatches=8)
            return jnp.sum(y ** 2)

        def loss_seq(params, x):
            return jnp.sum(self._sequential(params, x) ** 2)

        g1 = jax.grad(loss_pipe, argnums=(0, 1))(params, x)
        g2 = jax.grad(loss_seq, argnums=(0, 1))(params, x)
        for a, b in zip(jax.tree_util.tree_leaves(g1),
                        jax.tree_util.tree_leaves(g2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5)

    def test_rejects_indivisible_batch(self):
        params, x = self._setup()
        mesh = _pipe_mesh(self.S)
        with pytest.raises(Exception, match="not divisible"):
            jax.block_until_ready(pipeline_apply(
                self._stage, params, x[:6], mesh, microbatches=4
            ))

    def test_rejects_wrong_stack_size(self):
        params, x = self._setup()
        mesh = _pipe_mesh(2)
        with pytest.raises(AssertionError, match="pipe size"):
            pipeline_apply(self._stage, params, x, mesh, microbatches=4)


class TestPipelineComposesWithDataParallel:
    """PP x DP: a ('pipe', 'data') mesh runs one independent pipeline
    per batch shard; numbers match the sequential stack."""

    def test_pp_dp_mesh_matches_sequential(self):
        import numpy as _np

        S, D, B, C = 4, 2, 16, 8
        mesh = Mesh(
            _np.array(jax.devices()[: S * D]).reshape(S, D),
            ("pipe", "data"),
        )
        rng = _np.random.default_rng(7)
        params = {
            "w": jnp.asarray(
                rng.normal(size=(S, C, C)).astype(_np.float32) / _np.sqrt(C)
            ),
            "b": jnp.asarray(
                rng.normal(size=(S, C)).astype(_np.float32) * 0.1
            ),
        }
        x = jnp.asarray(rng.normal(size=(B, C)).astype(_np.float32))

        def stage(p, z):
            return jnp.tanh(z @ p["w"] + p["b"])

        out = pipeline_apply(
            stage, params, x, mesh, axis="pipe", microbatches=4,
            data_axis="data",
        )
        ref = x
        for s in range(S):
            ref = stage(
                jax.tree_util.tree_map(lambda p: p[s], params), ref
            )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-6)

        # gradients flow through the composed mesh too
        def loss(params):
            y = pipeline_apply(stage, params, x, mesh, microbatches=4,
                               data_axis="data")
            return jnp.sum(y ** 2)

        g = jax.grad(loss)(params)
        assert all(
            np.isfinite(np.asarray(l)).all()
            for l in jax.tree_util.tree_leaves(g)
        )


class TestPipelineTransformerBlocks:
    """The real thing: MixSTE transformer Blocks as pipeline stages."""

    def _blocks(self):
        from manipose_tpu.models.mix_ste import Block

        block = Block(dim=32, num_heads=4, drop_path=0.0)
        rng = np.random.default_rng(1)
        x = jnp.asarray(
            rng.normal(size=(8, 17, 32)).astype(np.float32)
        )
        per_stage = [
            block.init(jax.random.PRNGKey(s), x) for s in range(4)
        ]
        return block, stack_stage_params(per_stage), x

    def test_block_pipeline_matches_sequential(self):
        block, stacked, x = self._blocks()
        mesh = _pipe_mesh(4)

        def stage(p, x):
            return block.apply(p, x, True)

        out = pipeline_apply(stage, stacked, x, mesh, microbatches=8)
        ref = x
        for s in range(4):
            ref = block.apply(
                jax.tree_util.tree_map(lambda p: p[s], stacked), ref, True
            )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5)

    def test_block_pipeline_trains(self):
        """One SGD step through the pipelined stack moves the loss."""
        block, stacked, x = self._blocks()
        mesh = _pipe_mesh(4)
        y = jnp.ones_like(x)

        def stage(p, x):
            return block.apply(p, x, True)

        def loss(params):
            out = pipeline_apply(stage, params, x, mesh, microbatches=8)
            return jnp.mean((out - y) ** 2)

        l0, g = jax.value_and_grad(loss)(stacked)
        stepped = jax.tree_util.tree_map(
            lambda p, g: p - 0.05 * g, stacked, g
        )
        l1 = loss(stepped)
        assert np.isfinite(float(l0)) and float(l1) < float(l0)

    def test_flagship_shape_depth8_d512_fwd_and_grad(self):
        """VERDICT r2 #6: depth-8 real Block stages at the flagship
        width (d=512, 8 heads) — fwd + grad parity vs the sequential
        stack on the 8-device CPU mesh."""
        from manipose_tpu.models.mix_ste import Block

        block = Block(dim=512, num_heads=8, drop_path=0.0)
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.normal(size=(4, 17, 512)).astype(np.float32))
        per_stage = [
            block.init(jax.random.PRNGKey(s), x) for s in range(8)
        ]
        stacked = stack_stage_params(per_stage)
        mesh = _pipe_mesh(8)

        def stage(p, z):
            return block.apply(p, z, True)

        def seq(params, z):
            for s in range(8):
                z = block.apply(
                    jax.tree_util.tree_map(lambda p: p[s], params), z, True
                )
            return z

        out = pipeline_apply(stage, stacked, x, mesh, microbatches=4)
        ref = seq(stacked, x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-4)

        def loss_pipe(params):
            return jnp.mean(
                pipeline_apply(stage, params, x, mesh, microbatches=4) ** 2
            )

        def loss_seq(params):
            return jnp.mean(seq(params, x) ** 2)

        g1 = jax.jit(jax.grad(loss_pipe))(stacked)
        g2 = jax.jit(jax.grad(loss_seq))(stacked)
        for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(g1)),
                        jax.tree_util.tree_leaves(jax.device_get(g2))):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-6)

    def test_stage_params_actually_sharded(self):
        """Each device must hold only its stage slice (the memory win)."""
        block, stacked, x = self._blocks()
        mesh = _pipe_mesh(4)
        from jax.sharding import NamedSharding, PartitionSpec as P

        placed = jax.tree_util.tree_map(
            lambda p: jax.device_put(p, NamedSharding(mesh, P("pipe"))),
            stacked,
        )
        leaf = jax.tree_util.tree_leaves(placed)[0]
        shard_shapes = {tuple(s.data.shape) for s in leaf.addressable_shards}
        assert all(s[0] == leaf.shape[0] // 4 for s in shard_shapes)

        def stage(p, x):
            return block.apply(p, x, True)

        out = pipeline_apply(stage, placed, x, mesh, microbatches=8)
        assert np.isfinite(np.asarray(out)).all()


class TestPipelinedFlagshipApply:
    """parallel/flagship.py: the GPipe-staged trunk apply is a drop-in
    for model.apply — same numbers, same gradients, same checkpoints
    (VERDICT r2 #1: the REAL flagship trunk, not a toy stage)."""

    def _model(self, depth=4, drop_path=0.0):
        from manipose_tpu.geometry import h36m_skeleton_17
        from manipose_tpu.models import ManifoldConfig, RMCLManifoldMixSTE

        skel = h36m_skeleton_17()
        cfg = ManifoldConfig(
            num_frame=9, embed_dim_rot=32, depth_rot=depth, num_heads_rot=4,
            embed_dim_seg=16, depth_seg=2, num_heads_seg=4, n_hyp=2,
            drop_path_rate=drop_path,
        )
        model = RMCLManifoldMixSTE(cfg, skel)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(8, 9, 17, 2)).astype(np.float32))
        params = model.init(jax.random.PRNGKey(0), x[:1])
        return model, skel, params, x

    def test_forward_matches_model_apply(self):
        from manipose_tpu.parallel import make_mesh
        from manipose_tpu.parallel.flagship import make_pipelined_apply

        model, _, params, x = self._model()
        mesh = make_mesh(data=2, pipe=4)
        apply_fn = make_pipelined_apply(
            model, mesh, data_axis="data", microbatches=2
        )
        p1, s1 = model.apply(params, x)
        with mesh:
            p2, s2 = jax.jit(
                lambda p, x: apply_fn(p, x, deterministic=True)
            )(params, x)
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p2),
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s2),
                                   atol=1e-5)

    def test_grads_match_model_apply(self):
        """Incl. the tied post-block norms: broadcast_to's VJP sums the
        per-stage cotangents, which is the exact tied-param gradient."""
        from manipose_tpu.parallel import make_mesh
        from manipose_tpu.parallel.flagship import make_pipelined_apply
        from manipose_tpu.train import LossConfig, compute_loss

        model, skel, params, x = self._model()
        mesh = make_mesh(data=2, pipe=4)
        apply_fn = make_pipelined_apply(
            model, mesh, data_axis="data", microbatches=2
        )
        rng = np.random.default_rng(1)
        y = jnp.asarray(rng.normal(size=(8, 9, 17, 3)).astype(np.float32))

        def loss(fn):
            def f(p):
                pred = fn(p, x, deterministic=True)
                return compute_loss(pred, y, LossConfig(rmcl=True), skel)[0]
            return f

        g1 = jax.jit(jax.grad(loss(
            lambda p, x, deterministic: model.apply(
                p, x, deterministic=deterministic
            )
        )))(params)
        with mesh:
            g2 = jax.jit(jax.grad(loss(
                lambda p, x, deterministic: apply_fn(
                    p, x, deterministic=deterministic
                )
            )))(params)
        for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(g1)),
                        jax.tree_util.tree_leaves(jax.device_get(g2))):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-5)

    def test_training_mode_with_stochastic_depth(self):
        """drop_path > 0: the stacked rate matrix + per-(stage, pair,
        tick) RNG folding produce a finite training step."""
        from manipose_tpu.parallel import make_mesh
        from manipose_tpu.parallel.flagship import make_pipelined_apply
        from manipose_tpu.train import (
            LossConfig, TrainState, make_optimizer, make_train_step,
        )

        model, skel, params, x = self._model(drop_path=0.2)
        mesh = make_mesh(data=2, pipe=4)
        apply_fn = make_pipelined_apply(
            model, mesh, data_axis="data", microbatches=2
        )
        rng = np.random.default_rng(2)
        y = jnp.asarray(rng.normal(size=(8, 9, 17, 3)).astype(np.float32))
        tx = make_optimizer(weight_decay=1e-6)
        step = make_train_step(
            apply_fn, LossConfig(rmcl=True), skel, tx, donate=False
        )
        with mesh:
            state = TrainState.create(params, tx, jax.random.PRNGKey(1))
            state, m = step(state, x, y, 1e-3)
            state, m2 = step(state, x, y, 1e-3)
        assert np.isfinite(float(m["loss"]))
        assert np.isfinite(float(m2["loss"]))

    def test_plain_mixste_with_head(self):
        """arch=mixste (trunk + LayerNorm/Linear head) pipelines too."""
        from manipose_tpu.models import MixSTE, MixSTEConfig
        from manipose_tpu.parallel import make_mesh
        from manipose_tpu.parallel.flagship import make_pipelined_apply

        cfg = MixSTEConfig(
            num_frame=9, embed_dim=32, depth=4, num_heads=4,
            drop_path_rate=0.0,
        )
        model = MixSTE(cfg)
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.normal(size=(4, 9, 17, 2)).astype(np.float32))
        params = model.init(jax.random.PRNGKey(0), x[:1])
        mesh = make_mesh(data=1, pipe=4)
        apply_fn = make_pipelined_apply(model, mesh, microbatches=4)
        ref = model.apply(params, x)
        with mesh:
            out = jax.jit(
                lambda p, x: apply_fn(p, x, deterministic=True)
            )(params, x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5)

    def test_pick_microbatches_clamps(self):
        from manipose_tpu.parallel.flagship import pick_microbatches

        assert pick_microbatches(16, 2, 4) == 4
        assert pick_microbatches(4, 2, 4) == 2
        assert pick_microbatches(6, 2, 4) == 3
        assert pick_microbatches(2, 2, 8) == 1
