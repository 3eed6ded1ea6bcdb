"""Fused Pallas attention vs the XLA reference path: forward + gradients
(runs in interpret mode on the CPU test backend)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from manipose_tpu.ops.attention import multi_head_attention
from manipose_tpu.ops.pallas_attention import flash_attention


def _qkv(b, h, n, d, seed=0):
    rng = np.random.default_rng(seed)
    return [
        jnp.asarray(rng.normal(size=(b, h, n, d)).astype(np.float32))
        for _ in range(3)
    ]


# MixSTE's two layouts: (joints, folded B*L) and (frames, folded B*J)
LAYOUTS = [(6, 4, 17, 64), (2, 4, 243, 64), (3, 2, 128, 32)]


class TestFlashAttention:
    @pytest.mark.parametrize("b,h,n,d", LAYOUTS)
    def test_forward_matches_xla(self, b, h, n, d):
        q, k, v = _qkv(b, h, n, d)
        scale = d**-0.5
        ours = flash_attention(q, k, v, scale)
        ref = jax.nn.softmax(
            jnp.einsum("bhnd,bhmd->bhnm", q, k) * scale, axis=-1
        )
        ref = jnp.einsum("bhnm,bhmd->bhnd", ref, v)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=2e-5)

    @pytest.mark.parametrize("b,h,n,d", [(2, 2, 17, 64), (1, 2, 100, 32)])
    def test_gradients_match_xla(self, b, h, n, d):
        q, k, v = _qkv(b, h, n, d, seed=1)
        scale = d**-0.5

        def loss_pallas(q, k, v):
            return jnp.sum(flash_attention(q, k, v, scale) ** 2)

        def loss_xla(q, k, v):
            p = jax.nn.softmax(
                jnp.einsum("bhnd,bhmd->bhnm", q, k) * scale, axis=-1
            )
            return jnp.sum(jnp.einsum("bhnm,bhmd->bhnd", p, v) ** 2)

        g_ours = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
        g_ref = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
        for ours, ref, name in zip(g_ours, g_ref, "qkv"):
            np.testing.assert_allclose(
                np.asarray(ours), np.asarray(ref), atol=5e-4,
                err_msg=f"d{name} mismatch",
            )

    def test_mha_wrapper_pallas_impl(self):
        q, k, v = _qkv(2, 4, 17, 32, seed=2)
        scale = 32**-0.5
        ours = multi_head_attention(q, k, v, scale, impl="pallas")
        ref = multi_head_attention(q, k, v, scale, impl="xla")
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=2e-5)

    def test_model_with_pallas_attention_matches_xla(self):
        """Full MixSTE forward equality across attention impls."""
        from manipose_tpu.models import MixSTE, MixSTEConfig

        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.normal(size=(2, 9, 17, 2)).astype(np.float32))
        cfg_xla = MixSTEConfig(
            num_frame=9, num_joints=17, embed_dim=32, depth=2, num_heads=4
        )
        cfg_pl = MixSTEConfig(
            num_frame=9, num_joints=17, embed_dim=32, depth=2, num_heads=4,
            attn_impl="pallas",
        )
        params = MixSTE(cfg_xla).init(jax.random.PRNGKey(0), x)
        out_xla = MixSTE(cfg_xla).apply(params, x)
        out_pl = MixSTE(cfg_pl).apply(params, x)
        np.testing.assert_allclose(
            np.asarray(out_pl), np.asarray(out_xla), atol=5e-5
        )


class TestPallasTemporalVariant:
    def test_pallas_temporal_matches_xla(self):
        """attn_impl=pallas_temporal (fused kernel only on the L-frame
        layout) reproduces the XLA model exactly."""
        import jax
        import jax.numpy as jnp

        from manipose_tpu.geometry import h36m_skeleton_17
        from manipose_tpu.models import ManifoldConfig, RMCLManifoldMixSTE

        skel = h36m_skeleton_17()
        rng = np.random.default_rng(5)
        x = jnp.asarray(rng.normal(size=(2, 9, 17, 2)).astype(np.float32))
        kw = dict(
            num_frame=9, embed_dim_rot=32, depth_rot=2, num_heads_rot=4,
            embed_dim_seg=16, depth_seg=2, num_heads_seg=4, n_hyp=2,
            drop_path_rate=0.0,
        )
        m_xla = RMCLManifoldMixSTE(ManifoldConfig(**kw), skel)
        m_pt = RMCLManifoldMixSTE(
            ManifoldConfig(attn_impl="pallas_temporal", **kw), skel
        )
        params = m_xla.init(jax.random.PRNGKey(0), x)
        p1, s1 = m_xla.apply(params, x)
        p2, s2 = m_pt.apply(params, x)
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=5e-5)
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-5)


class TestPackedFlashAttention:
    """Block-diagonal packed kernel for the spatial N=17 layout."""

    @pytest.mark.parametrize("b,h,n,d", [(6, 4, 17, 64), (8, 2, 17, 32),
                                         (5, 1, 17, 64)])
    def test_forward_matches_xla(self, b, h, n, d):
        from manipose_tpu.ops.pallas_attention import flash_attention_packed

        q, k, v = _qkv(b, h, n, d, seed=2)
        scale = d**-0.5
        ours = flash_attention_packed(q, k, v, scale)
        ref = jax.nn.softmax(
            jnp.einsum("bhnd,bhmd->bhnm", q, k) * scale, axis=-1
        )
        ref = jnp.einsum("bhnm,bhmd->bhnd", ref, v)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                                   atol=2e-5)

    def test_gradients_match_xla(self):
        from manipose_tpu.ops.pallas_attention import flash_attention_packed

        b, h, n, d = 6, 2, 17, 32
        q, k, v = _qkv(b, h, n, d, seed=3)
        scale = d**-0.5

        def loss_packed(q, k, v):
            return jnp.sum(flash_attention_packed(q, k, v, scale) ** 2)

        def loss_xla(q, k, v):
            p = jax.nn.softmax(
                jnp.einsum("bhnd,bhmd->bhnm", q, k) * scale, axis=-1
            )
            return jnp.sum(jnp.einsum("bhnm,bhmd->bhnd", p, v) ** 2)

        g_ours = jax.grad(loss_packed, argnums=(0, 1, 2))(q, k, v)
        g_ref = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
        for ours, ref, name in zip(g_ours, g_ref, "qkv"):
            np.testing.assert_allclose(
                np.asarray(ours), np.asarray(ref), atol=5e-4,
                err_msg=f"d{name} mismatch",
            )

    def test_group_picker(self):
        from manipose_tpu.ops.pallas_attention import _pick_group

        # flagship spatial fold: B*L*h = 16*243*8 = 31104; largest G <= 15
        # dividing it is 12 (12*17 = 204 rows per tile)
        assert _pick_group(31104, 17) == 12
        assert _pick_group(7, 17) == 7
        assert _pick_group(1, 243) == 1
