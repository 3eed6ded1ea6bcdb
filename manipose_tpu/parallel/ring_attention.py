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

Sequence lengths that do not divide the ring size are zero-padded up to
the next multiple and the pad KEY positions masked at -1e9: their
softmax weights underflow to +0.0 (the same construction as the packed
spatial attention, ``ops/attention.py``), and the online-softmax
rescaling kills any transient mass if a fully-masked block is seen
before a real one. Pad QUERY rows attend real keys normally and are
sliced off the output. This is what lets L=243 ride an 8-way ring.

Gradients flow through ``shard_map`` + ``ppermute`` natively, so the
same function serves training.

``RingSpec`` bundles the mesh + axis names so model configs
(``models/mix_ste.py: MixSTEConfig.ring``) can carry the sharding plan
as static metadata: ``batch_axis`` composes ring sequence parallelism
with data parallelism (the folded batch dim shards over it).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


@dataclasses.dataclass(frozen=True)
class RingSpec:
    """Static plan for ring attention: which mesh, which axis shards the
    sequence, and (optionally) which axis shards the batch."""

    mesh: Mesh
    axis: str = "model"
    batch_axis: Optional[str] = None


def _ring_attention_local(q, k, v, kmask, scale: float, axis_name: str):
    """Per-device body. q, k, v: (B, H, n_local, d); kmask: (m_local,)
    True on real (non-pad) key positions of the currently-held block."""
    p = jax.lax.psum(1, axis_name)

    q32 = q.astype(jnp.float32) * scale

    # streaming softmax state
    m = jnp.full(q.shape[:3], -jnp.inf, jnp.float32)          # row max
    l = jnp.zeros(q.shape[:3], jnp.float32)                   # row sum
    o = jnp.zeros(q32.shape, jnp.float32)                     # unnormalized out

    def accumulate(m, l, o, k_blk, v_blk, kmask_blk):
        scores = jnp.einsum(
            "bhnd,bhmd->bhnm", q32, k_blk.astype(jnp.float32)
        )  # (B, H, n_local, m_local)
        # pad keys at -1e9: softmax weight underflows to +0.0, and the
        # online rescale (alpha) zeroes any transient mass should an
        # all-pad block arrive before the first real one
        scores = jnp.where(kmask_blk[None, None, None, :], scores, -1e9)
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
        m, l, o, k_blk, v_blk, kmask_blk = carry
        m, l, o = accumulate(m, l, o, k_blk, v_blk, kmask_blk)
        # rotate K/V (and the pad mask) one hop around the ring
        perm = [(i, (i + 1) % p) for i in range(p)]
        k_blk = jax.lax.ppermute(k_blk, axis_name, perm)
        v_blk = jax.lax.ppermute(v_blk, axis_name, perm)
        kmask_blk = jax.lax.ppermute(kmask_blk, axis_name, perm)
        return m, l, o, k_blk, v_blk, kmask_blk

    # p-1 accumulate+rotate steps, then the final block without the
    # rotate (its output would be discarded — a wasted ICI collective
    # a loop cannot dead-code away)
    m, l, o, k, v, kmask = jax.lax.fori_loop(
        0, p - 1, body, (m, l, o, k, v, kmask)
    )
    m, l, o = accumulate(m, l, o, k, v, kmask)
    # pad QUERY rows see only real keys, so l > 0 for them too; the
    # guard covers the degenerate all-pad-ring case and keeps the VJP
    # NaN-free for rows whose output is sliced away
    out = o / jnp.where(l == 0.0, 1.0, l)[..., None]
    return out.astype(q.dtype)


def ring_attention(
    q: jnp.ndarray,  # (B, H, N, d), N sharded over `axis`
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float,
    mesh: Mesh,
    axis: str = "model",
    batch_axis: Optional[str] = None,
) -> jnp.ndarray:
    """Exact attention with the sequence axis sharded over ``axis``.

    N that does not divide the ring size is zero-padded to the next
    multiple (pad keys masked, pad query rows sliced off). Returns
    (B, H, N, d) with the same output sharding as Q. ``batch_axis``
    additionally shards the batch dim over that mesh axis (dp x sp).
    """
    b, h, n, d = q.shape
    p = mesh.shape[axis]
    if batch_axis is not None and b % mesh.shape[batch_axis]:
        # uneven batch (e.g. an eval loader's sliced final batch):
        # replicate it within the shard_map instead of sharding — a
        # trace-time decision on the static shape, numerics unchanged
        batch_axis = None
    n_pad = -n % p
    kmask = jnp.arange(n + n_pad) < n
    if n_pad:
        pad = [(0, 0), (0, 0), (0, n_pad), (0, 0)]
        q, k, v = (jnp.pad(t, pad) for t in (q, k, v))
    spec = P(batch_axis, None, axis, None)
    fn = jax.shard_map(
        functools.partial(
            _ring_attention_local, scale=scale, axis_name=axis
        ),
        mesh=mesh,
        in_specs=(spec, spec, spec, P(axis)),
        out_specs=spec,
        check_vma=False,
    )
    out = fn(q, k, v, kmask)
    return out[:, :, :n] if n_pad else out
