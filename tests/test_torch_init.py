"""torch-matching weight init (model.init=torch): every Linear-style
kernel/bias redrawn as U(-1/sqrt(fan_in), +1/sqrt(fan_in)); everything
else untouched."""

import numpy as np

import jax
import jax.numpy as jnp

from manipose_tpu.geometry import h36m_skeleton_17
from manipose_tpu.models import ManifoldConfig, RMCLManifoldMixSTE
from manipose_tpu.train import torch_match_init


def _params():
    cfg = ManifoldConfig(
        num_frame=9, embed_dim_rot=32, depth_rot=2, num_heads_rot=4,
        embed_dim_seg=16, depth_seg=2, num_heads_seg=4, n_hyp=2,
    )
    model = RMCLManifoldMixSTE(cfg, h36m_skeleton_17())
    return model, model.init(jax.random.PRNGKey(0), jnp.zeros((1, 9, 17, 2)))


def test_kernels_bounded_and_nonzero_biases():
    model, params = _params()
    redrawn = torch_match_init(params, 3)
    flat = jax.tree_util.tree_flatten_with_path(redrawn)[0]
    n_kernels = n_biases = 0
    for path, leaf in flat:
        name = jax.tree_util.keystr(path[-1:], simple=True)
        a = np.asarray(leaf)
        if name.endswith("kernel") and a.ndim >= 2:
            bound = 1.0 / np.sqrt(a.shape[-2])
            assert np.abs(a).max() <= bound + 1e-6, path
            assert np.abs(a).max() > 0.5 * bound  # actually redrawn
            n_kernels += 1
        elif name.endswith("bias") and np.abs(a).max() > 0:
            n_biases += 1  # torch biases are uniform, flax's are zeros
    assert n_kernels > 20 and n_biases > 20

    # layernorm scales / zero pos-embeds untouched
    for path, leaf in flat:
        name = jax.tree_util.keystr(path[-1:], simple=True)
        if name == "scale":
            assert (np.asarray(leaf) == 1).all()
        if name.endswith("pos_embed"):
            assert (np.asarray(leaf) == 0).all()

    # model still runs and is deterministic in the init seed
    out1 = model.apply(redrawn, jnp.ones((2, 9, 17, 2)))
    assert all(np.isfinite(np.asarray(o)).all() for o in out1)
    redrawn2 = torch_match_init(params, 3)
    for a, b in zip(jax.tree_util.tree_leaves(redrawn),
                    jax.tree_util.tree_leaves(redrawn2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_driver_init_scheme_knob(tmp_path):
    from manipose_tpu.config import load_config
    from manipose_tpu.drivers.common import init_model_params, instantiate_model

    cfg = load_config(
        "config",
        overrides=[
            "data.seq_len=9", "model.layers=2", "model.channels=32",
            "model.nheads=4", "model.layers_seg=2", "model.channels_seg=16",
            "model.nheads_seg=4", "multi_hyp.n_hyp=2",
        ],
    )
    model, _ = instantiate_model(cfg, h36m_skeleton_17())
    flax_params = init_model_params(model, cfg, 17)
    cfg.model["init"] = "torch"
    torch_params = init_model_params(model, cfg, 17)
    # flax default: zero biases; torch scheme: uniform biases
    def first_bias(p):
        for path, leaf in jax.tree_util.tree_flatten_with_path(p)[0]:
            if jax.tree_util.keystr(path[-1:], simple=True) == "bias" \
                    and "norm" not in jax.tree_util.keystr(path, simple=True):
                return np.asarray(leaf)
    assert (first_bias(flax_params) == 0).all()
    assert np.abs(first_bias(torch_params)).max() > 0
