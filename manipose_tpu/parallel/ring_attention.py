"""Ring attention: sequence/context parallelism over the device mesh.

The reference's temporal attention is dense quadratic over L=243 frames
(``mix_ste.py:255-282``) — fine on one chip. To scale the temporal
context far beyond that (SURVEY §2.8: "scaling L beyond ~8k would add
blockwise/ring variants"), this module shards the SEQUENCE axis over a
mesh axis and computes exact attention with a ring schedule:

  - each device holds its (N/P)-length Q/K/V block;
  - P steps: attend the local Q block against the currently-held K/V
    block with streaming (online-softmax) accumulation, then rotate the
    K/V blocks one hop around the ring with ``ppermute`` — compute and
    ICI transfer overlap, and no device ever materializes more than a
    (N/P, N/P) score tile;
  - the result is EXACT attention (online softmax is associative), so
    outputs match the dense computation up to reduction-order rounding.

Gradients flow through ``shard_map`` + ``ppermute`` natively, so the
same function serves training.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def _ring_attention_local(q, k, v, scale: float, axis_name: str):
    """Per-device body. q, k, v: (B, H, n_local, d)."""
    p = jax.lax.psum(1, axis_name)

    q32 = q.astype(jnp.float32) * scale

    # streaming softmax state
    m = jnp.full(q.shape[:3], -jnp.inf, jnp.float32)          # row max
    l = jnp.zeros(q.shape[:3], jnp.float32)                   # row sum
    o = jnp.zeros(q32.shape, jnp.float32)                     # unnormalized out

    def accumulate(m, l, o, k_blk, v_blk):
        scores = jnp.einsum(
            "bhnd,bhmd->bhnm", q32, k_blk.astype(jnp.float32)
        )  # (B, H, n_local, n_local)
        blk_max = jnp.max(scores, axis=-1)
        new_m = jnp.maximum(m, blk_max)
        # rescale previous accumulators to the new max
        alpha = jnp.exp(m - new_m)
        probs = jnp.exp(scores - new_m[..., None])
        l = l * alpha + jnp.sum(probs, axis=-1)
        o = o * alpha[..., None] + jnp.einsum(
            "bhnm,bhmd->bhnd", probs, v_blk.astype(jnp.float32)
        )
        return new_m, l, o

    def body(step, carry):
        m, l, o, k_blk, v_blk = carry
        m, l, o = accumulate(m, l, o, k_blk, v_blk)
        # rotate K/V one hop around the ring
        perm = [(i, (i + 1) % p) for i in range(p)]
        k_blk = jax.lax.ppermute(k_blk, axis_name, perm)
        v_blk = jax.lax.ppermute(v_blk, axis_name, perm)
        return m, l, o, k_blk, v_blk

    # p-1 accumulate+rotate steps, then the final block without the
    # rotate (its output would be discarded — a wasted ICI collective
    # a loop cannot dead-code away)
    m, l, o, k, v = jax.lax.fori_loop(0, p - 1, body, (m, l, o, k, v))
    m, l, o = accumulate(m, l, o, k, v)
    out = o / l[..., None]
    return out.astype(q.dtype)


def ring_attention(
    q: jnp.ndarray,  # (B, H, N, d), N sharded over `axis`
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float,
    mesh: Mesh,
    axis: str = "model",
) -> jnp.ndarray:
    """Exact attention with the sequence axis sharded over ``axis``.

    N must divide evenly by the mesh axis size. Returns (B, H, N, d)
    with the same output sharding as Q.
    """
    n = q.shape[2]
    p = mesh.shape[axis]
    assert n % p == 0, f"sequence {n} not divisible by ring size {p}"
    spec = P(None, None, axis, None)
    fn = jax.shard_map(
        functools.partial(
            _ring_attention_local, scale=scale, axis_name=axis
        ),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_vma=False,
    )
    return fn(q, k, v)
