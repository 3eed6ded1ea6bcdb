"""The golden parity test: convert a reference torch checkpoint and
assert forward-pass equivalence between the torch reference model and
this package's flax models, end to end (trunks + heads + FK decode)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from manipose_tpu.geometry import h36m_skeleton_17
from manipose_tpu.models import (
    ManifoldConfig,
    ManifoldMixSTE,
    MixSTE,
    MixSTEConfig,
    RMCLManifoldMixSTE,
)
from manipose_tpu.train.checkpoint import (
    convert_torch_state_dict,
    restore_checkpoint,
    save_checkpoint,
)

from conftest import install_reference_stubs, load_ref_module
from test_geometry import _reference_h36m_17

install_reference_stubs()

ref_mix_ste = load_ref_module("mh_so3_hpe.architectures.mix_ste")
ref_manifold = load_ref_module("mh_so3_hpe.architectures.manifold_mix_ste")
ref_rmcl = load_ref_module("mh_so3_hpe.architectures.rmcl_manifold_mix_ste")

B, L, J = 2, 27, 17
DIMS = dict(embed=64, depth=3, heads=4, embed_seg=32, depth_seg=2, n_hyp=3)


def _input():
    rng = np.random.default_rng(0)
    return rng.normal(size=(B, L, J, 2)).astype(np.float32)


@pytest.fixture(scope="module")
def ref_skel():
    return _reference_h36m_17()


class TestMixSTEParity:
    def test_forward_equivalence(self):
        torch.manual_seed(0)
        tmodel = ref_mix_ste.MixSTE(
            num_frame=L, num_joints=J, in_chans=2, out_dim=3,
            embed_dim=DIMS["embed"], depth=DIMS["depth"],
            num_heads=DIMS["heads"], qkv_bias=True, drop_path_rate=0.1,
        )
        tmodel.eval()
        x = _input()
        with torch.no_grad():
            ref_out = tmodel(torch.from_numpy(x)).numpy()

        variables = convert_torch_state_dict(tmodel.state_dict(), "mixste")
        cfg = MixSTEConfig(
            num_frame=L, num_joints=J, embed_dim=DIMS["embed"],
            depth=DIMS["depth"], num_heads=DIMS["heads"],
        )
        ours = MixSTE(cfg).apply(
            jax.tree_util.tree_map(jnp.asarray, variables), jnp.asarray(x)
        )
        np.testing.assert_allclose(np.asarray(ours), ref_out, atol=2e-5)


def _manifold_kwargs(ref_skel):
    return dict(
        skeleton=ref_skel, num_frame=L, num_joints=J, num_bones=16,
        in_chans=2, rot_rep_dim=6,
        embed_dim_rot=DIMS["embed"], depth_rot=DIMS["depth"],
        num_heads_rot=DIMS["heads"],
        embed_dim_seg=DIMS["embed_seg"], depth_seg=DIMS["depth_seg"],
        num_heads_seg=DIMS["heads"],
    )


def _our_cfg():
    return ManifoldConfig(
        num_frame=L, num_joints=J, num_bones=16,
        embed_dim_rot=DIMS["embed"], depth_rot=DIMS["depth"],
        num_heads_rot=DIMS["heads"],
        embed_dim_seg=DIMS["embed_seg"], depth_seg=DIMS["depth_seg"],
        num_heads_seg=DIMS["heads"], n_hyp=DIMS["n_hyp"],
    )


class TestManifoldParity:
    def test_forward_equivalence(self, ref_skel):
        torch.manual_seed(1)
        tmodel = ref_manifold.ManifoldMixSTE(**_manifold_kwargs(ref_skel))
        tmodel.eval()
        x = _input()
        with torch.no_grad():
            ref_out = tmodel(torch.from_numpy(x)).numpy()

        variables = convert_torch_state_dict(tmodel.state_dict(), "manifold")
        ours = ManifoldMixSTE(_our_cfg(), h36m_skeleton_17()).apply(
            jax.tree_util.tree_map(jnp.asarray, variables), jnp.asarray(x)
        )
        np.testing.assert_allclose(np.asarray(ours), ref_out, atol=5e-5)


class TestRMCLParity:
    def test_forward_equivalence(self, ref_skel):
        torch.manual_seed(2)
        tmodel = ref_rmcl.RMCLManifoldMixSTE(
            n_hyp=DIMS["n_hyp"], **_manifold_kwargs(ref_skel)
        )
        tmodel.eval()
        x = _input()
        with torch.no_grad():
            ref_poses, ref_scores = tmodel(torch.from_numpy(x))

        variables = convert_torch_state_dict(
            tmodel.state_dict(), "rmcl_manifold"
        )
        poses, scores = RMCLManifoldMixSTE(_our_cfg(), h36m_skeleton_17()).apply(
            jax.tree_util.tree_map(jnp.asarray, variables), jnp.asarray(x)
        )
        np.testing.assert_allclose(
            np.asarray(poses), ref_poses.numpy(), atol=5e-5
        )
        np.testing.assert_allclose(
            np.asarray(scores), ref_scores.numpy(), atol=1e-5
        )

    @pytest.mark.parametrize(
        "shape",
        [
            # 4D rotation repr, wide-shallow trunk, K=5
            dict(embed=96, depth=1, heads=6, embed_seg=16, depth_seg=1,
                 heads_seg=4, n_hyp=5, rot=4, frames=9),
            # K=1 edge (single-hypothesis rMCL), deep-narrow trunk
            dict(embed=32, depth=4, heads=2, embed_seg=48, depth_seg=3,
                 heads_seg=3, n_hyp=1, rot=6, frames=27),
        ],
        ids=["rot4d-k5", "k1-deep"],
    )
    def test_forward_equivalence_across_shapes(self, ref_skel, shape):
        """The converter and the flax models must stay parity-exact at
        shapes the fixed-DIMS tests never visit (alternate rotation
        repr, head counts, trunk aspect ratios, window lengths)."""
        torch.manual_seed(7)
        kw = dict(
            skeleton=ref_skel, num_frame=shape["frames"], num_joints=J,
            num_bones=16, in_chans=2, rot_rep_dim=shape["rot"],
            embed_dim_rot=shape["embed"], depth_rot=shape["depth"],
            num_heads_rot=shape["heads"],
            embed_dim_seg=shape["embed_seg"], depth_seg=shape["depth_seg"],
            num_heads_seg=shape["heads_seg"],
        )
        tmodel = ref_rmcl.RMCLManifoldMixSTE(n_hyp=shape["n_hyp"], **kw)
        tmodel.eval()
        rng = np.random.default_rng(11)
        x = rng.normal(size=(B, shape["frames"], J, 2)).astype(np.float32)
        with torch.no_grad():
            ref_poses, ref_scores = tmodel(torch.from_numpy(x))

        variables = convert_torch_state_dict(
            tmodel.state_dict(), "rmcl_manifold"
        )
        cfg = ManifoldConfig(
            num_frame=shape["frames"], num_joints=J, num_bones=16,
            rot_rep_dim=shape["rot"],
            embed_dim_rot=shape["embed"], depth_rot=shape["depth"],
            num_heads_rot=shape["heads"],
            embed_dim_seg=shape["embed_seg"], depth_seg=shape["depth_seg"],
            num_heads_seg=shape["heads_seg"], n_hyp=shape["n_hyp"],
        )
        poses, scores = RMCLManifoldMixSTE(cfg, h36m_skeleton_17()).apply(
            jax.tree_util.tree_map(jnp.asarray, variables), jnp.asarray(x)
        )
        np.testing.assert_allclose(
            np.asarray(poses), ref_poses.numpy(), atol=5e-5
        )
        np.testing.assert_allclose(
            np.asarray(scores), ref_scores.numpy(), atol=1e-5
        )

    def test_wrapped_and_dataparallel_keys(self, ref_skel):
        torch.manual_seed(3)
        tmodel = ref_rmcl.RMCLManifoldMixSTE(
            n_hyp=DIMS["n_hyp"], **_manifold_kwargs(ref_skel)
        )
        sd = {"module." + k: v for k, v in tmodel.state_dict().items()}
        wrapped = {"model_pos": sd}
        variables = convert_torch_state_dict(wrapped, "rmcl_manifold")
        heads = variables["params"]["rotations_module"]["heads"]
        assert heads["pred_kernel"].shape == (
            DIMS["n_hyp"], DIMS["embed"], 7,
        )


class TestOrbaxRoundtrip:
    def test_save_restore(self, tmp_path):
        rng = np.random.default_rng(4)
        tree = {
            "a": jnp.asarray(rng.normal(size=(3, 4)).astype(np.float32)),
            "nested": {"b": jnp.asarray(np.arange(5, dtype=np.int32))},
        }
        save_checkpoint(tmp_path, "best_val", tree)
        restored = restore_checkpoint(tmp_path, "best_val", tree)
        np.testing.assert_array_equal(np.asarray(restored["a"]), np.asarray(tree["a"]))
        np.testing.assert_array_equal(
            np.asarray(restored["nested"]["b"]), np.asarray(tree["nested"]["b"])
        )


class TestReverseConversion:
    """flax -> torch .pth export (models trained here load back into the
    reference drivers, ``main_h36m_lifting.py:755-761``)."""

    def test_roundtrip_torch_to_flax_to_torch(self):
        """ref state dict -> flax -> ref state dict is the identity."""
        from manipose_tpu.train.checkpoint import convert_to_torch_state_dict

        torch.manual_seed(7)
        tmodel = ref_rmcl.RMCLManifoldMixSTE(
            n_hyp=DIMS["n_hyp"], **_manifold_kwargs(_reference_h36m_17())
        )
        sd0 = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
        variables = convert_torch_state_dict(tmodel.state_dict(), "rmcl_manifold")
        sd1 = convert_to_torch_state_dict(variables, "rmcl_manifold")
        assert set(sd1) == set(sd0), (
            set(sd0) - set(sd1), set(sd1) - set(sd0)
        )
        for k in sd0:
            np.testing.assert_array_equal(sd0[k], sd1[k], err_msg=k)

    def test_flax_to_torch_file_and_back(self, tmp_path):
        """save_torch_checkpoint emits a .pth our loader converts back to
        the identical flax pytree (model_pos wrapper honored)."""
        from manipose_tpu.train.checkpoint import (
            load_torch_checkpoint,
            save_torch_checkpoint,
        )

        cfg = MixSTEConfig(
            num_frame=9, num_joints=17, embed_dim=32, depth=2, num_heads=4,
            drop_path_rate=0.0,
        )
        model = MixSTE(cfg)
        x = jnp.zeros((1, 9, 17, 2))
        variables = model.init(jax.random.PRNGKey(0), x)
        path = tmp_path / "exported.pth"
        save_torch_checkpoint(path, variables, "mixste")
        restored = load_torch_checkpoint(path, "mixste")
        src_leaves = jax.tree_util.tree_flatten_with_path(
            variables["params"]
        )[0]
        dst_leaves = jax.tree_util.tree_flatten_with_path(
            restored["params"]
        )[0]
        assert len(src_leaves) == len(dst_leaves)  # zip must not truncate
        for (p1, a), (p2, b) in zip(src_leaves, dst_leaves):
            assert p1 == p2
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-7, err_msg=str(p1))
