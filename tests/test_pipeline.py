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
