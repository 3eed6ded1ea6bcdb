"""Pallas TPU fused attention for MixSTE's two layouts.

MixSTE attends over short sequences (J=17 joints spatially, L=243 frames
temporally) with huge folded batches (B*L and B*J). The XLA path
materializes the (N, N) probability tensor in HBM between the two
matmuls; these kernels keep the entire score/softmax/PV chain in VMEM —
one HBM round-trip for Q/K/V/O, fp32 accumulation.

Design notes (round 2):
  - NO host-side padding. The round-1 kernel ``jnp.pad``-ed Q/K/V to
    (256, 128) tiles in HBM before the call and sliced the output after,
    which roughly tripled HBM traffic and made the kernel LOSE to XLA
    (32.1 vs 34.4 seq/s, BASELINE.md r1). Blocks are now the true
    (N, d) shapes; Mosaic pads the VMEM tiles internally, so HBM moves
    only real bytes.
  - Whole-block kernels (no online-softmax streaming): N <= 243 fits in
    VMEM with room to spare, so streaming would only add bookkeeping.
  - ``flash_attention_packed`` covers the spatial N=17 layout: G windows
    are packed into one MXU tile per grid cell with a block-diagonal
    mask, turning 17x17 matmuls (terrible MXU occupancy) into
    (G*17)x(G*17) ones.

A custom VJP implements the matching fused backward (dV/dQ/dK from the
recomputed probability block), so the kernels serve train + eval.

Reference semantics: ``hpe/mh_so3_hpe/architectures/mix_ste.py:255-282``
(scores * scale, softmax over keys, no masking inside a window).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import needs_interpret as _needs_interpret


# ---------------------------------------------------------------------------
# dense whole-sequence kernel (temporal layout: N=243)
# ---------------------------------------------------------------------------
def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    q = q_ref[0].astype(jnp.float32)  # (N, d)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (N, N)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.dot(probs, v, preferred_element_type=jnp.float32)
    o_ref[0] = out.astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref,
                *, scale: float):
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)

    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    probs = jax.nn.softmax(scores, axis=-1)  # (N, N)

    dv = jax.lax.dot_general(
        probs, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # P^T dO
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # dO V^T
    ds = probs * (dp - jnp.sum(dp * probs, axis=-1, keepdims=True))
    dq = jnp.dot(ds, k, preferred_element_type=jnp.float32) * scale
    dk = jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # dS^T Q

    dq_ref[0] = dq.astype(dq_ref.dtype)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _spec(n: int, d: int):
    return pl.BlockSpec((1, n, d), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def flash_attention(q, k, v, scale: float):
    """Fused attention. q, k, v: (B, h, N, d) -> (B, h, N, d)."""
    return _forward(q, k, v, scale)


def _forward(q, k, v, scale):
    b, h, n, d = q.shape

    def flat(x):
        return x.reshape(b * h, n, d)

    spec = _spec(n, d)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((b * h, n, d), q.dtype),
        grid=(b * h,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        interpret=_needs_interpret(),
    )(flat(q), flat(k), flat(v))
    return out.reshape(b, h, n, d)


def _forward_fwd(q, k, v, scale):
    return _forward(q, k, v, scale), (q, k, v)


def _forward_bwd(scale, residuals, g):
    q, k, v = residuals
    b, h, n, d = q.shape

    def flat(x):
        return x.reshape(b * h, n, d)

    spec = _spec(n, d)
    shape = jax.ShapeDtypeStruct((b * h, n, d), q.dtype)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale),
        out_shape=(shape, shape, shape),
        grid=(b * h,),
        in_specs=[spec] * 4,
        out_specs=(spec, spec, spec),
        interpret=_needs_interpret(),
    )(flat(q), flat(k), flat(v), flat(g))

    def unflat(x):
        return x.reshape(b, h, n, d)

    return unflat(dq), unflat(dk), unflat(dv)


flash_attention.defvjp(_forward_fwd, _forward_bwd)


# ---------------------------------------------------------------------------
# packed block-diagonal kernel (spatial layout: N=17, huge folded batch)
# ---------------------------------------------------------------------------
def _packed_fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, n: int):
    # block (1, G*N, d): the G windows are pre-flattened on the host side
    # (a free contiguous reshape in HBM; Mosaic cannot shape-cast
    # (G, N, d) -> (G*N, d) inside the kernel)
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (G*N, G*N)
    row_w = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 0) // n
    col_w = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1) // n
    scores = jnp.where(row_w == col_w, scores, -jnp.inf)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.dot(probs, v, preferred_element_type=jnp.float32)
    o_ref[0] = out.astype(o_ref.dtype)


def _packed_bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref,
                       *, scale: float, n: int):
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)

    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    row_w = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 0) // n
    col_w = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1) // n
    mask = row_w == col_w
    scores = jnp.where(mask, scores, -jnp.inf)
    probs = jax.nn.softmax(scores, axis=-1)

    dv = jax.lax.dot_general(
        probs, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = probs * (dp - jnp.sum(dp * probs, axis=-1, keepdims=True))
    # masked entries have probs==0 so ds==0 there already
    dq = jnp.dot(ds, k, preferred_element_type=jnp.float32) * scale
    dk = jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale

    dq_ref[0] = dq.astype(dq_ref.dtype)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _pick_group(bh: int, n: int, target_rows: int = 256) -> int:
    """Largest G dividing bh with G*n <= target_rows."""
    from .attention import largest_dividing_group

    return largest_dividing_group(bh, max(1, target_rows // n))


def _packed_spec(g: int, n: int, d: int):
    return pl.BlockSpec((1, g * n, d), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def flash_attention_packed(q, k, v, scale: float):
    """Fused attention for tiny N: packs G windows per MXU tile.

    q, k, v: (B, h, N, d) -> (B, h, N, d). Each grid cell computes one
    (G*N, G*N) score matrix with a block-diagonal window mask instead of
    G separate NxN ones.
    """
    return _packed_forward(q, k, v, scale)


def _packed_forward(q, k, v, scale):
    b, h, n, d = q.shape
    bh = b * h
    g = _pick_group(bh, n)

    def flat(x):
        return x.reshape(bh // g, g * n, d)

    spec = _packed_spec(g, n, d)
    out = pl.pallas_call(
        functools.partial(_packed_fwd_kernel, scale=scale, n=n),
        out_shape=jax.ShapeDtypeStruct((bh // g, g * n, d), q.dtype),
        grid=(bh // g,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        interpret=_needs_interpret(),
    )(flat(q), flat(k), flat(v))
    return out.reshape(b, h, n, d)


def _packed_forward_fwd(q, k, v, scale):
    return _packed_forward(q, k, v, scale), (q, k, v)


def _packed_forward_bwd(scale, residuals, grad):
    q, k, v = residuals
    b, h, n, d = q.shape
    bh = b * h
    g = _pick_group(bh, n)

    def flat(x):
        return x.reshape(bh // g, g * n, d)

    spec = _packed_spec(g, n, d)
    shape = jax.ShapeDtypeStruct((bh // g, g * n, d), q.dtype)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_packed_bwd_kernel, scale=scale, n=n),
        out_shape=(shape, shape, shape),
        grid=(bh // g,),
        in_specs=[spec] * 4,
        out_specs=(spec, spec, spec),
        interpret=_needs_interpret(),
    )(flat(q), flat(k), flat(v), flat(grad))

    def unflat(x):
        return x.reshape(b, h, n, d)

    return unflat(dq), unflat(dk), unflat(dv)


flash_attention_packed.defvjp(_packed_forward_fwd, _packed_forward_bwd)
