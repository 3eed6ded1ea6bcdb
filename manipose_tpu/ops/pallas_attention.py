"""Pallas TPU fused attention for MixSTE's two layouts.

MixSTE attends over short sequences (J=17 joints spatially, L=243 frames
temporally) with huge folded batches (B*L and B*J). The XLA path
materializes the (N, N) probability tensor in HBM between ops; this
kernel keeps the entire score/softmax/PV chain for one (batch, head) in
VMEM — a single HBM round-trip for Q/K/V/O. Because N <= ~512 here, a
whole-block kernel (no online-softmax streaming) is optimal: one MXU
matmul pair per grid cell, fp32 accumulation.

A custom VJP implements the matching fused backward (dV/dQ/dK from the
recomputed probability block), so the kernel is usable in training.

Reference semantics: ``hpe/mh_so3_hpe/architectures/mix_ste.py:255-282``
(scores * scale, softmax over keys, no masking inside a window).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _needs_interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, n_valid: int):
    q = q_ref[0].astype(jnp.float32)  # (N_pad, d)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (N_pad, N_pad)
    n_pad = scores.shape[-1]
    if n_valid < n_pad:
        col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        scores = jnp.where(col < n_valid, scores, -jnp.inf)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.dot(probs, v, preferred_element_type=jnp.float32)
    o_ref[0] = out.astype(o_ref.dtype)


def _bwd_kernel(
    q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref,
    *, scale: float, n_valid: int,
):
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)

    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    n_pad = scores.shape[-1]
    if n_valid < n_pad:
        col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        scores = jnp.where(col < n_valid, scores, -jnp.inf)
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


def _block_specs(n_pad: int, d_pad: int, n: int):
    return pl.BlockSpec(
        (1, n_pad, d_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def flash_attention(q, k, v, scale: float):
    """Fused attention. q, k, v: (B, h, N, d) -> (B, h, N, d)."""
    return _forward(q, k, v, scale)


def _pad_inputs(q, k, v):
    b, h, n, d = q.shape
    n_pad = max(_round_up(n, 128), 128)
    d_pad = max(_round_up(d, 128), 128)
    def pad(x):
        x = x.reshape(b * h, n, d)
        return jnp.pad(x, ((0, 0), (0, n_pad - n), (0, d_pad - d)))
    return pad(q), pad(k), pad(v), (b, h, n, d, n_pad, d_pad)


def _forward(q, k, v, scale):
    qp, kp, vp, (b, h, n, d, n_pad, d_pad) = _pad_inputs(q, k, v)
    spec = _block_specs(n_pad, d_pad, n)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, n_valid=n),
        out_shape=jax.ShapeDtypeStruct((b * h, n_pad, d_pad), q.dtype),
        grid=(b * h,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        interpret=_needs_interpret(),
    )(qp, kp, vp)
    return out[:, :n, :d].reshape(b, h, n, d)


def _forward_fwd(q, k, v, scale):
    return _forward(q, k, v, scale), (q, k, v)


def _forward_bwd(scale, residuals, g):
    q, k, v = residuals
    qp, kp, vp, (b, h, n, d, n_pad, d_pad) = _pad_inputs(q, k, v)
    gp = jnp.pad(
        g.reshape(b * h, n, d), ((0, 0), (0, n_pad - n), (0, d_pad - d))
    )
    spec = _block_specs(n_pad, d_pad, n)
    shape = jax.ShapeDtypeStruct((b * h, n_pad, d_pad), q.dtype)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, n_valid=n),
        out_shape=(shape, shape, shape),
        grid=(b * h,),
        in_specs=[spec] * 4,
        out_specs=(spec, spec, spec),
        interpret=_needs_interpret(),
    )(qp, kp, vp, gp)

    def unpad(x):
        return x[:, :n, :d].reshape(b, h, n, d)

    return unpad(dq), unpad(dk), unpad(dv)


flash_attention.defvjp(_forward_fwd, _forward_bwd)
