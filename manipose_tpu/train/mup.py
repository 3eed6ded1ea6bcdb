"""muP (Maximal Update Parametrization) optimizer support.

The reference uses ``mup.MuAdam`` + ``MuReadout`` + base shapes built
from a channels=64 model (``hpe/main_h36m_lifting.py:673-695``). Here
the same width-scaling rules are implemented directly:

- hidden "matrix-like" weights (both fan_in and fan_out grow with the
  embedding width: qkv/proj/fc1/fc2 kernels and the stacked MCL
  prediction kernels) train with lr / width_mult;
- vector-like params (biases, LayerNorms, positional tables) and weights
  with a fixed fan_in (patch embeds, joints->segments projection, score
  heads) keep the base lr;
- readout scaling is handled in the models (input divided by
  width_mult when ``mup=True``);
- attention uses 1/d scores and residuals scale by 1/sqrt(depth) in the
  blocks (``mix_ste.py:243,330``);
- the reference's "width-seq_scaling" base shapes vary BOTH channels
  (64 vs 128) and seq_len (27 vs 81) between the base and delta models
  (``main_h36m_lifting.py:683-691``), which makes the temporal
  positional table (L, C) two-infinite-dimensional — mup's MuAdam then
  scales its LR by 1/width_mult like any matrix-like weight. The same
  rule is applied here (``temporal_pos_embed``); the spatial table
  (J=17, C) keeps one infinite dim and full LR.
"""

from __future__ import annotations

import re

import jax
import optax

# Param paths whose LR scales as 1/width_mult (hidden matrix-like).
# NOT listed: readout kernels (trunk head and the stacked MCL
# `heads/pred_kernel` — shape (C_infinite, out_finite)): MuReadout
# weights have ONE infinite dim so MuAdam keeps their full LR; their
# width correction is the forward-pass input division instead
# (mix_ste.py readout_div, rmcl.py:66-67).
_MATRIX_LIKE = (
    r"attn/qkv/kernel$",
    r"attn/proj/kernel$",
    r"mlp/fc1/kernel$",
    r"mlp/fc2/kernel$",
    # seq-scaling axis: (L, C) tables have two infinite dims under the
    # reference's width-seq base shapes (main_h36m_lifting.py:683-691)
    r"temporal_pos_embed$",
)


def _is_matrix_like(path: str) -> bool:
    return any(re.search(p, path) for p in _MATRIX_LIKE)


def mup_lr_scales(params, width_mult: float):
    """Per-param LR multiplier pytree."""

    def scale(path, _):
        p = jax.tree_util.keystr(path, simple=True, separator="/")
        return (1.0 / width_mult) if _is_matrix_like(p) else 1.0

    return jax.tree_util.tree_map_with_path(scale, params)


def make_mup_optimizer(
    params,
    width: int,
    base_width: int = 64,
    weight_decay: float = 1e-6,
    grad_clip: float = 0.0,
    skip_nonfinite: bool = False,
) -> optax.GradientTransformation:
    """MuAdam-semantics optimizer: torch-coupled weight decay + Adam with
    per-param LR scaling; the global LR is injected per step like
    :func:`manipose_tpu.train.optim.make_optimizer`, and the same
    robustness knobs (``grad_clip``/``skip_nonfinite``) apply so
    ``model.mup=true`` does not silently drop them."""
    width_mult = width / base_width
    scales = mup_lr_scales(params, width_mult)

    def scale_by_mup():
        def init_fn(params):
            return optax.EmptyState()

        def update_fn(updates, state, params=None):
            updates = jax.tree_util.tree_map(
                lambda u, s: u * s, updates, scales
            )
            return updates, state

        return optax.GradientTransformation(init_fn, update_fn)

    def chain(learning_rate):
        parts = []
        if grad_clip > 0.0:
            parts.append(optax.clip_by_global_norm(grad_clip))
        parts += [
            optax.add_decayed_weights(weight_decay),
            optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
            scale_by_mup(),
            optax.scale(-learning_rate),
        ]
        return optax.chain(*parts)

    tx = optax.inject_hyperparams(chain)(learning_rate=0.0)
    if skip_nonfinite:
        tx = optax.apply_if_finite(tx, max_consecutive_errors=10_000)
    return tx
