"""Attention cores: reference-exact XLA path + (later) Pallas TPU kernels.

The MixSTE trunk runs two attention layouts:
  spatial  — sequence length J (17 joints), folded batch B*L
  temporal — sequence length L (243 frames), folded batch B*J
Both are small enough that the score matrix fits VMEM comfortably; the
XLA path below fuses well. A Pallas flash-attention kernel for the
temporal layout lives in ``pallas_attention.py`` and is selected via
``impl="pallas"`` when beneficial.

Semantics parity with ``hpe/mh_so3_hpe/architectures/mix_ste.py:225-282``
(incl. the transposed-score ``comb`` mode, which the reference never
enables in its configs).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def multi_head_attention(
    q: jnp.ndarray,  # (B, h, N, d)
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float,
    comb: bool = False,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    deterministic: bool = True,
    impl: str = "xla",
) -> jnp.ndarray:
    """Scaled-dot-product attention over pre-split heads.

    Returns (B, N, h*d) merged-head output.
    """
    # The fused kernel has a custom VJP, so it serves train + eval; it only
    # lacks attention-probability dropout (rate 0 in every reference config).
    if impl == "pallas" and not comb and (deterministic or dropout_rate == 0.0):
        from .pallas_attention import flash_attention

        out = flash_attention(q, k, v, scale)  # (B, h, N, d)
        b, h, n, d = out.shape
        return jnp.transpose(out, (0, 2, 1, 3)).reshape(b, n, h * d)

    if comb:
        # transposed-attention mode (``mix_ste.py:268-279``)
        attn = jnp.einsum("bhnd,bhne->bhde", q, k) * scale
        attn = jax.nn.softmax(attn, axis=-1)
        attn = _attn_dropout(attn, dropout_rate, dropout_rng, deterministic)
        out = jnp.einsum("bhde,bhne->bhnd", attn, v)
    else:
        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k) * scale
        attn = jax.nn.softmax(attn, axis=-1)
        attn = _attn_dropout(attn, dropout_rate, dropout_rng, deterministic)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)

    b, h, n, d = out.shape
    return jnp.transpose(out, (0, 2, 1, 3)).reshape(b, n, h * d)


def _attn_dropout(attn, rate, rng, deterministic):
    if deterministic or rate == 0.0:
        return attn
    keep = jax.random.bernoulli(rng, 1.0 - rate, attn.shape)
    return jnp.where(keep, attn / (1.0 - rate), 0.0)
