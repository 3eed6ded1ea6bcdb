"""Joint-major residual-stream layout (``MixSTEConfig.layout``).

``layout="joint_major"`` keeps one persistent (B, J, L, C) tensor through
the trunk — temporal blocks fold contiguously, spatial attention runs as
a multi-batch-dim einsum (``ops/attention.joint_major_attention``) — so
the fold layout's 16 physical transposes per forward disappear. These
tests pin the contract: identical parameters, identical math (fwd + grad
parity vs fold), and the reference's DropPath per-(b, l) mask
granularity (timm semantics on the folded (B*L, J, C) batch,
``hpe/mh_so3_hpe/architectures/mix_ste.py:285-330``).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from manipose_tpu.geometry import h36m_skeleton_17
from manipose_tpu.models import ManifoldConfig, RMCLManifoldMixSTE
from manipose_tpu.models.mix_ste import DropPath, MixSTE, MixSTEConfig


@pytest.fixture(scope="module")
def small_cfg():
    return MixSTEConfig(
        num_frame=12, num_joints=17, embed_dim=64, depth=3, num_heads=4
    )


@pytest.fixture(scope="module")
def x_small():
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.normal(size=(2, 12, 17, 2)).astype(np.float32))


class TestJointMajorParity:
    def test_mixste_forward_identical(self, small_cfg, x_small):
        m_fold = MixSTE(small_cfg)
        m_jm = MixSTE(dataclasses.replace(small_cfg, layout="joint_major"))
        params = m_fold.init(jax.random.PRNGKey(0), x_small)
        y_fold = m_fold.apply(params, x_small)
        y_jm = m_jm.apply(params, x_small)  # same params: layouts share them
        np.testing.assert_allclose(y_fold, y_jm, atol=1e-5, rtol=0)

    def test_mixste_grad_parity(self, small_cfg, x_small):
        m_fold = MixSTE(small_cfg)
        m_jm = MixSTE(dataclasses.replace(small_cfg, layout="joint_major"))
        params = m_fold.init(jax.random.PRNGKey(0), x_small)
        g_fold = jax.grad(lambda p: jnp.sum(m_fold.apply(p, x_small) ** 2))(
            params
        )
        g_jm = jax.grad(lambda p: jnp.sum(m_jm.apply(p, x_small) ** 2))(params)
        flat_fold = jax.tree_util.tree_leaves_with_path(g_fold)
        flat_jm = {
            jax.tree_util.keystr(k): v
            for k, v in jax.tree_util.tree_leaves_with_path(g_jm)
        }
        assert len(flat_fold) == len(flat_jm)
        for ka, a in flat_fold:
            key = jax.tree_util.keystr(ka)
            np.testing.assert_allclose(
                a, flat_jm[key], atol=5e-4, rtol=1e-4, err_msg=key
            )

    def test_rmcl_flagship_arch_parity(self, x_small):
        skel = h36m_skeleton_17()
        cfg = ManifoldConfig(
            num_frame=12, n_hyp=3, embed_dim_rot=64, depth_rot=2,
            num_heads_rot=4, embed_dim_seg=32, depth_seg=1,
        )
        m_fold = RMCLManifoldMixSTE(cfg, skel)
        m_jm = RMCLManifoldMixSTE(
            dataclasses.replace(cfg, layout="joint_major"), skel
        )
        params = m_fold.init(jax.random.PRNGKey(1), x_small)
        poses_f, scores_f = m_fold.apply(params, x_small)
        poses_j, scores_j = m_jm.apply(params, x_small)
        np.testing.assert_allclose(poses_f, poses_j, atol=5e-5, rtol=0)
        np.testing.assert_allclose(scores_f, scores_j, atol=1e-6, rtol=0)

    def test_train_mode_runs_and_is_finite(self, x_small):
        skel = h36m_skeleton_17()
        cfg = ManifoldConfig(
            num_frame=12, n_hyp=3, embed_dim_rot=64, depth_rot=2,
            num_heads_rot=4, embed_dim_seg=32, depth_seg=1,
            drop_path_rate=0.5, layout="joint_major",
        )
        model = RMCLManifoldMixSTE(cfg, skel)
        params = model.init(jax.random.PRNGKey(1), x_small)
        poses, scores = model.apply(
            params, x_small, deterministic=False,
            rngs={"dropout": jax.random.PRNGKey(2)},
        )
        assert bool(jnp.all(jnp.isfinite(poses)))
        assert bool(jnp.all(jnp.isfinite(scores)))

    def test_incompatible_spatial_impl_rejected(self, small_cfg, x_small):
        cfg = dataclasses.replace(
            small_cfg, layout="joint_major", attn_impl="pallas"
        )
        with pytest.raises(AssertionError, match="joint_major"):
            MixSTE(cfg).init(jax.random.PRNGKey(0), x_small)

    def test_pallas_temporal_combines_with_joint_major(
        self, small_cfg, x_small
    ):
        """The temporal blocks still fold to 3D, so non-XLA temporal
        impls stay available under joint_major (setup only routes the
        SPATIAL attention through the 4D path)."""
        cfg = dataclasses.replace(
            small_cfg, layout="joint_major", attn_impl="pallas_temporal"
        )
        # init alone exercises setup()'s routing; pallas kernels don't
        # run on the CPU test backend so stop at construction
        MixSTE(cfg)  # must not raise at construction


class TestDropPathGranularity:
    """DropPath masks vary over keep_axes only — the joint-major spatial
    blocks use keep_axes=(0, 2) to reproduce the reference's per-(b, l)
    stochastic-depth granularity on a (B, J, L, C) tensor."""

    def _mask(self, keep_axes, shape):
        dp = DropPath(rate=0.5, keep_axes=keep_axes)
        x = jnp.ones(shape, jnp.float32)
        out = dp.apply(
            {}, x, False, rngs={"dropout": jax.random.PRNGKey(0)}
        )
        return np.asarray(out)

    def test_default_masks_per_leading_row(self):
        out = self._mask((0,), (64, 3, 5))
        # constant within each row; both kept and dropped rows exist
        per_row = out.reshape(64, -1)
        assert all(len(np.unique(r)) == 1 for r in per_row)
        assert len(np.unique(per_row[:, 0])) == 2

    def test_joint_major_masks_per_batch_frame(self):
        out = self._mask((0, 2), (4, 17, 32, 3))
        # constant across joints and channels for a given (b, l)...
        assert np.all(out.max(axis=(1, 3)) == out.min(axis=(1, 3)))
        # ...but varying across frames (rate 0.5 on 4*32 slots)
        assert len(np.unique(out.max(axis=(1, 3)))) == 2
