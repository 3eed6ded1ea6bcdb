"""Pipeline parallelism: GPipe-style stage execution over a mesh axis.

The reference has no model parallelism of any kind (its only multi-device
mechanism is ``nn.DataParallel``, ``hpe/main_h36m_lifting.py:747-753``),
and the ~35M-param flagship does not *need* pipelining — this module
exists so the framework scales the same trunk to depths/widths where a
single chip's HBM cannot hold the layer stack (SURVEY §2.8: PP listed
"not required" for parity; provided as a capability).

Schedule: classic GPipe. The S pipeline stages live one-per-device along
a mesh axis; the batch is split into M microbatches; the loop runs
M + S - 1 ticks. At every tick each device applies its stage to the
activation it holds, then the activations rotate one hop along the axis
with ``ppermute`` (stage s's output becomes stage s+1's next input).
Stage 0 injects microbatch t at tick t; the last stage emits microbatch
t-(S-1). The pipeline bubble is the standard (S-1)/(M+S-1) fraction —
choose M >> S to amortize.

Everything is ``shard_map`` + ``lax.scan`` + ``ppermute``, so XLA sees a
static schedule (collectives ride ICI) and reverse-mode AD works through
the whole pipeline: the VJP of ``ppermute`` is the reverse rotation, so
``jax.grad`` of a pipelined loss IS pipelined backprop, bubble included
— no hand-written backward schedule.

Stage parameters are passed STACKED: every leaf has a leading axis of
size S, sharded over the pipe axis, so each device holds exactly its
stage's slice (this is also the memory win: 1/S of the layer stack per
device).
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def _pipeline_local(stacked_params, x, *, stage_fn, axis_name: str,
                    microbatches: int, pass_tick: bool = False):
    """Per-device body. ``stacked_params`` leaves: (1, ...) — this
    device's stage slice; ``x``: the full (replicated) batch."""
    s = jax.lax.axis_index(axis_name)
    n_stages = jax.lax.psum(1, axis_name)  # static: the axis size
    params = jax.tree_util.tree_map(lambda p: p[0], stacked_params)

    m = microbatches
    b = x.shape[0]
    assert b % m == 0, f"batch {b} not divisible by {m} microbatches"
    xs = x.reshape(m, b // m, *x.shape[1:])

    mb_shape = xs.shape[1:]
    state = jnp.zeros(mb_shape, x.dtype)          # activation in flight
    outs = jnp.zeros((m, *mb_shape), x.dtype)     # last stage's results

    perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]

    def tick(carry, t):
        state, outs = carry
        # stage 0 feeds microbatch t (recomputes the last one during the
        # drain ticks — gated out below, pure bubble waste)
        inp = jnp.where(s == 0, xs[jnp.clip(t, 0, m - 1)], state)
        y = stage_fn(params, inp, t) if pass_tick else stage_fn(params, inp)
        # the last stage emits microbatch t-(S-1)
        m_out = t - (n_stages - 1)
        valid = (s == n_stages - 1) & (m_out >= 0)
        idx = jnp.clip(m_out, 0, m - 1)
        outs = outs.at[idx].set(jnp.where(valid, y, outs[idx]))
        # rotate activations one hop: s's output -> s+1's next input
        state = jax.lax.ppermute(y, axis_name, perm)
        return (state, outs), None

    ticks = jnp.arange(m + n_stages - 1)
    (state, outs), _ = jax.lax.scan(tick, (state, outs), ticks)
    # only the last stage wrote non-zeros; psum replicates its buffer
    outs = jax.lax.psum(outs, axis_name)
    return outs.reshape(b, *x.shape[1:])


def pipeline_apply(
    stage_fn: Callable,
    stacked_params,
    x: jnp.ndarray,
    mesh: Mesh,
    axis: str = "pipe",
    microbatches: int = 8,
    data_axis: str = None,
    pass_tick: bool = False,
) -> jnp.ndarray:
    """Apply S sequential stages as a GPipe pipeline over ``axis``.

    stage_fn(params, x_mb) -> y_mb applies ONE stage to one microbatch
    (``pass_tick=True`` calls stage_fn(params, x_mb, t) with the traced
    schedule tick — e.g. to fold the microbatch index into RNG keys);
    activations must keep a fixed shape across stages (true for any
    transformer trunk). ``stacked_params``: pytree whose leaves are the
    per-stage params stacked on a new leading axis of size S =
    ``mesh.shape[axis]``. ``x``: (B, ...) with B divisible by
    ``microbatches``. Returns stage_{S-1}(... stage_0(x)) replicated.

    ``data_axis`` composes PP with data parallelism on a 2-axis mesh:
    the batch dim shards over it, each data-shard runs an independent
    pipeline over ``axis`` (``microbatches`` then applies per shard, so
    the per-shard batch B / data_size must divide by it), and the output
    keeps the batch sharding.

    Differentiable: ``jax.grad`` through this IS pipelined backprop.
    """
    n_stages = mesh.shape[axis]
    param_specs = jax.tree_util.tree_map(
        lambda p: P(axis), stacked_params
    )
    for leaf in jax.tree_util.tree_leaves(stacked_params):
        assert leaf.shape[0] == n_stages, (
            f"stacked param leading axis {leaf.shape[0]} != pipe size "
            f"{n_stages}"
        )
    batch_spec = P(data_axis) if data_axis else P()
    fn = jax.shard_map(
        functools.partial(
            _pipeline_local,
            stage_fn=stage_fn,
            axis_name=axis,
            microbatches=microbatches,
            pass_tick=pass_tick,
        ),
        mesh=mesh,
        in_specs=(param_specs, batch_spec),
        out_specs=batch_spec,
        check_vma=False,
    )
    return fn(stacked_params, x)


def stack_stage_params(per_stage_params):
    """Stack a list of identically-shaped per-stage pytrees into the
    leading-axis layout ``pipeline_apply`` expects."""
    return jax.tree_util.tree_map(
        lambda *leaves: jnp.stack(leaves), *per_stage_params
    )
