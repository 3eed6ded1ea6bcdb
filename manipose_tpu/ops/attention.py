"""Attention cores: reference-exact XLA paths + Pallas TPU kernels.

The MixSTE trunk runs two attention layouts:
  spatial  — sequence length J (17 joints), folded batch B*L
  temporal — sequence length L (243 frames), folded batch B*J

Temporal (N=243) is served best by XLA's batched matmuls (measured r2 on
the chip: 2.6 ms fwd vs 4.0 ms for the fused Pallas kernel at the
flagship shape). Spatial (N=17) is dominated by tiny-matmul overhead, so
the default path PACKS G=8 windows into one block-diagonal attention per
batched matmul (``_xla_packed_attention``): measured 4.3/6.6 ms fwd/grad
vs 5.4/7.9 ms unpacked — a ~17 ms/step saving across the 8 spatial
layers. The packing is semantics-preserving: masked scores sit at -1e9,
so their softmax weights underflow to +0.0 and contribute exact zeros to
the PV contraction; outputs match the per-window computation up to
reduction-order rounding (~2e-7 in fp32 — the packed einsum regroups
the partial sums), which is far below the 5e-5 parity tolerance.

Pallas flash-attention kernels for both layouts live in
``pallas_attention.py`` (``impl="pallas"``); they fuse the whole chain
in VMEM but lose to XLA at these shapes on the current chip
(BASELINE.md r2 kernel study). ``impl="xla_direct"`` forces the
unpacked einsum path even at tiny N (an A/B escape hatch for perf
studies; packed stays the measured in-context winner at B=16).

Semantics parity with ``hpe/mh_so3_hpe/architectures/mix_ste.py:225-282``
(incl. the transposed-score ``comb`` mode, which the reference never
enables in its configs).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


# Packing group bound for the tiny-N (spatial) block-diagonal path.
# Module-level so perf studies (tools/step_ablation.py --pack-group) can
# sweep it. 8 is the measured in-graph optimum at the flagship shape:
# full-step sweep (r3, 12-step timings on the chip) read g=6 407.7 ms,
# g=8 377.0 ms, g=12 436.8 ms (g=16 regressed in the r2 sweep) — the
# lane-padding hypothesis (17*6=102 fits one 128-lane tile, 17*8=136
# spills to 256) does NOT win: masked-score work grows as g^2 while
# batch shrinks only as 1/g, and XLA's layout handling of the 136-wide
# tile beats both alternatives.
SPATIAL_PACK_MAX_GROUP = 8


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
    ring=None,  # RingSpec (parallel/ring_attention.py) when impl="ring"
) -> jnp.ndarray:
    """Scaled-dot-product attention over pre-split heads.

    Returns (B, N, h*d) merged-head output.
    """
    if impl == "ring":
        # sequence-parallel exact attention over a mesh axis (the SP/CP
        # path; no reference counterpart — its temporal attention is
        # dense single-device, ``mix_ste.py:255-282``). Like the Pallas
        # kernel it carries no attention-probability dropout, which is 0
        # in every reference config.
        assert ring is not None, "impl='ring' needs a RingSpec"
        assert not comb, "ring attention does not support comb mode"
        assert deterministic or dropout_rate == 0.0, (
            "ring attention does not implement attention-prob dropout"
        )
        from ..parallel.ring_attention import ring_attention

        out = ring_attention(
            q, k, v, scale, ring.mesh, axis=ring.axis,
            batch_axis=ring.batch_axis,
        )
        b, h, n, d = out.shape
        return jnp.transpose(out, (0, 2, 1, 3)).reshape(b, n, h * d)

    # The fused kernel has a custom VJP, so it serves train + eval; it only
    # lacks attention-probability dropout (rate 0 in every reference config).
    if impl == "pallas" and not comb and (deterministic or dropout_rate == 0.0):
        from .pallas_attention import flash_attention, flash_attention_packed

        # tiny sequences (the spatial J=17 layout) pack multiple windows
        # per MXU tile; long ones (temporal L=243) use the dense kernel
        kernel = flash_attention_packed if q.shape[2] <= 32 else flash_attention
        out = kernel(q, k, v, scale)  # (B, h, N, d)
        b, h, n, d = out.shape
        return jnp.transpose(out, (0, 2, 1, 3)).reshape(b, n, h * d)

    if comb:
        # transposed-attention mode (``mix_ste.py:268-279``)
        attn = jnp.einsum("bhnd,bhne->bhde", q, k) * scale
        attn = jax.nn.softmax(attn, axis=-1)
        attn = _attn_dropout(attn, dropout_rate, dropout_rng, deterministic)
        out = jnp.einsum("bhde,bhne->bhnd", attn, v)
    elif (
        impl != "xla_direct"
        and q.shape[2] <= 32
        and (deterministic or dropout_rate == 0.0)
        and largest_dividing_group(
            q.shape[0] * q.shape[1], SPATIAL_PACK_MAX_GROUP
        ) > 1
    ):
        # tiny-N (spatial) layout: block-diagonal window packing
        out = _xla_packed_attention(q, k, v, scale)
    else:
        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k) * scale
        attn = jax.nn.softmax(attn, axis=-1)
        attn = _attn_dropout(attn, dropout_rate, dropout_rng, deterministic)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)

    b, h, n, d = out.shape
    return jnp.transpose(out, (0, 2, 1, 3)).reshape(b, n, h * d)


def joint_major_attention(
    q: jnp.ndarray,  # (B, J, L, h, d)
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    deterministic: bool = True,
) -> jnp.ndarray:
    """Spatial attention over the J axis of a joint-major (B, J, L, C)
    residual stream, with (B, L, h) as dot_general batch dims.

    This is the spatial core of ``MixSTEConfig.layout="joint_major"``: the
    trunk keeps one persistent (B, J, L, C) layout so the per-layer
    physical transposes of the fold layout (2 x 67 MB HBM round-trips per
    spatial/temporal pair at the flagship shape, plus their backward
    twins) disappear; XLA folds the strided J access into the einsum's
    data feed. Measured on-chip (r3): 32.6 ms vs 34.9 ms per fwd+bwd
    block pair. Semantics identical to the folded per-window attention
    (``hpe/mh_so3_hpe/architectures/mix_ste.py:225-282``) up to
    fp32-accumulation reduction order.

    Returns (B, J, L, h*d) merged-head output.
    """
    b, j, l, h, d = q.shape
    scores = jnp.einsum("bjlhd,bklhd->blhjk", q, k) * scale
    probs = jax.nn.softmax(scores, axis=-1)
    probs = _attn_dropout(probs, dropout_rate, dropout_rng, deterministic)
    out = jnp.einsum("blhjk,bklhd->bjlhd", probs, v)
    return out.reshape(b, j, l, h * d)


def largest_dividing_group(bh: int, max_group: int) -> int:
    """Largest g <= max_group dividing bh. Shared by the XLA packed path
    (max_group=8 — measured fastest, 136-row score tiles; 16 regresses)
    and the packed Pallas kernel (max_group = 256 // n rows/tile)."""
    g = max(1, max_group)
    while g > 1 and bh % g:
        g -= 1
    return g


def _xla_packed_attention(q, k, v, scale):
    """Batch G windows into one (G*N, G*N) block-diagonal attention.

    Masked scores are -1e9, whose softmax weights underflow to +0.0 and
    contribute exact zeros in the PV contraction; outputs match the
    per-window computation up to reduction-order rounding (~2e-7 fp32 —
    the packed einsum regroups partial sums).
    """
    b, h, n, d = q.shape
    bh = b * h
    g = largest_dividing_group(bh, SPATIAL_PACK_MAX_GROUP)
    assert g > 1, "caller dispatches here only when packing applies"

    def flat(x):
        return x.reshape(bh // g, g * n, d)

    scores = jnp.einsum("bnd,bmd->bnm", flat(q), flat(k)) * scale
    window = jnp.arange(g * n) // n
    scores = jnp.where(window[:, None] == window[None, :], scores, -1e9)
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    out = jnp.einsum("bnm,bmd->bnd", probs, flat(v))
    return out.reshape(b, h, n, d)


def _attn_dropout(attn, rate, rng, deterministic):
    if deterministic or rate == 0.0:
        return attn
    keep = jax.random.bernoulli(rng, 1.0 - rate, attn.shape)
    return jnp.where(keep, attn / (1.0 - rate), 0.0)
