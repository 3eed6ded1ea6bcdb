"""Weight-init schemes.

Flax and torch default to different Linear initializations (lecun-normal
kernels + zero biases vs kaiming-uniform(a=sqrt(5)) kernels + uniform
biases, both with bound 1/sqrt(fan_in)). Checkpoint loading is
unaffected, but fresh-training trajectories differ systematically at
short horizons. ``model.init=torch`` re-draws every Linear-style
kernel/bias pair with the torch distribution so from-scratch training
matches the reference's starting conditions
(``torch.nn.Linear.reset_parameters``); everything else (LayerNorms,
zero-initialized positional tables) already matches.
"""

from __future__ import annotations

import jax
import numpy as np


def torch_match_init(params, seed: int):
    """Re-draw Linear kernels/biases with torch's default distribution.

    kaiming_uniform(a=sqrt(5)) on a torch (out, in) weight reduces to
    U(-b, b) with b = 1/sqrt(fan_in); torch biases use the same bound.
    Applied to every {kernel, bias} (and stacked rMCL head
    {pred_kernel, pred_bias} / {score_kernel, score_bias}) pair; other
    leaves (LayerNorm scale/bias, zero pos-embeds) keep their values.
    """
    rng = np.random.default_rng(seed)
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)

    # kernel fan_in by parent path, to bound the matching bias
    fan_in_by_parent = {}
    for path, leaf in flat:
        name = jax.tree_util.keystr(path[-1:], simple=True)
        parent = jax.tree_util.keystr(path[:-1], simple=True, separator="/")
        if name.endswith("kernel") and np.ndim(leaf) >= 2:
            # flax kernels are (..., in, out): fan_in is the
            # second-to-last axis (leading axes stack heads/hypotheses)
            fan_in_by_parent[(parent, name.replace("kernel", ""))] = (
                np.shape(leaf)[-2]
            )

    new_leaves = []
    for path, leaf in flat:
        name = jax.tree_util.keystr(path[-1:], simple=True)
        parent = jax.tree_util.keystr(path[:-1], simple=True, separator="/")
        bound = None
        if name.endswith("kernel") and np.ndim(leaf) >= 2:
            bound = 1.0 / np.sqrt(np.shape(leaf)[-2])
        elif name.endswith("bias"):
            fan_in = fan_in_by_parent.get(
                (parent, name.replace("bias", ""))
            )
            if fan_in:
                bound = 1.0 / np.sqrt(fan_in)
        if bound is None:
            new_leaves.append(leaf)
        else:
            new_leaves.append(
                rng.uniform(-bound, bound, size=np.shape(leaf)).astype(
                    np.asarray(leaf).dtype
                )
            )
    return jax.tree_util.tree_unflatten(treedef, new_leaves)
