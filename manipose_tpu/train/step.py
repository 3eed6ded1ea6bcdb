"""Jitted train/eval steps.

One fused XLA graph per step: forward (trunks + FK decode), loss, grads,
torch-semantics Adam update. The learning rate is a dynamic scalar input
(host-side schedulers, see ``optim.py``); no per-step host syncs — loss
scalars are returned as device arrays and only read when logged
(the reference's per-batch ``.item()``, ``main_h36m_lifting.py:308``,
forces a sync every step).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..geometry.skeleton import Skeleton
from ..utils.platform import tpu_compiler_options
from .losses import LossConfig, compute_loss
from .optim import make_optimizer, set_learning_rate


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    rng: jax.Array

    @classmethod
    def create(cls, params, tx: optax.GradientTransformation, rng: jax.Array):
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=tx.init(params),
            rng=rng,
        )


def make_train_step(
    apply_fn: Callable,
    loss_cfg: LossConfig,
    skeleton: Optional[Skeleton],
    tx: optax.GradientTransformation,
    donate: bool = True,
    accum_steps: int = 1,
):
    """Build the jitted train step.

    apply_fn(params, x, deterministic, rngs) -> prediction.
    Returns step(state, pose_2d, pose_3d, lr) -> (state, metrics dict).

    accum_steps > 1 splits the batch into that many microbatches and
    accumulates gradients with ``lax.scan`` before the single optimizer
    update — large effective batches without the activation memory
    (each microbatch's activations die before the next starts).
    """

    def loss_fn(params, pose_2d, pose_3d, dropout_rng):
        prediction = apply_fn(
            params,
            pose_2d,
            deterministic=False,
            rngs={"dropout": dropout_rng},
        )
        total, terms = compute_loss(prediction, pose_3d, loss_cfg, skeleton)
        return total, terms

    def accumulate_grads(params, pose_2d, pose_3d, dropout_rng):
        if accum_steps == 1:
            return jax.value_and_grad(loss_fn, has_aux=True)(
                params, pose_2d, pose_3d, dropout_rng
            )
        b = pose_2d.shape[0]
        if b % accum_steps:
            # partial final batches (n_valid slicing) may not split into
            # equal microbatches; take the single-shot gradient instead
            # (this is a per-n_valid retrace anyway, so the branch is
            # resolved at trace time)
            return jax.value_and_grad(loss_fn, has_aux=True)(
                params, pose_2d, pose_3d, dropout_rng
            )
        micro = b // accum_steps
        x_mb = pose_2d.reshape(accum_steps, micro, *pose_2d.shape[1:])
        y_mb = pose_3d.reshape(accum_steps, micro, *pose_3d.shape[1:])
        rngs = jax.random.split(dropout_rng, accum_steps)

        def body(carry, mb):
            g_acc, total_acc, terms_acc = carry
            x, y, r = mb
            (total, terms), g = jax.value_and_grad(loss_fn, has_aux=True)(
                params, x, y, r
            )
            g_acc = jax.tree_util.tree_map(jnp.add, g_acc, g)
            terms_acc = jax.tree_util.tree_map(jnp.add, terms_acc, terms)
            return (g_acc, total_acc + total, terms_acc), None

        (total0, terms0), g0 = jax.value_and_grad(loss_fn, has_aux=True)(
            params, x_mb[0], y_mb[0], rngs[0]
        )
        (g, total, terms), _ = jax.lax.scan(
            body, (g0, total0, terms0), (x_mb[1:], y_mb[1:], rngs[1:])
        )
        inv = 1.0 / accum_steps
        g = jax.tree_util.tree_map(lambda v: v * inv, g)
        terms = jax.tree_util.tree_map(lambda v: v * inv, terms)
        return (total * inv, terms), g

    def step(state: TrainState, pose_2d, pose_3d, lr, n_valid: int = None):
        if n_valid is not None:
            # drop duplicated padding rows of a partial final batch
            # (the reference trains on a smaller final batch instead)
            pose_2d = pose_2d[:n_valid]
            pose_3d = pose_3d[:n_valid]
        rng, dropout_rng = jax.random.split(state.rng)
        (total, terms), grads = accumulate_grads(
            state.params, pose_2d, pose_3d, dropout_rng
        )
        opt_state = state.opt_state
        # inject_hyperparams exposes the LR as mutable state
        set_learning_rate(opt_state, lr)
        updates, opt_state = tx.update(grads, opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1, params=params, opt_state=opt_state, rng=rng
        )
        metrics = {"loss": total, **terms}
        return new_state, metrics

    donate_argnums = (0,) if donate else ()
    return jax.jit(
        step,
        donate_argnums=donate_argnums,
        static_argnums=(4,),
        compiler_options=tpu_compiler_options(),
    )


def make_multi_train_step(
    apply_fn: Callable,
    loss_cfg: LossConfig,
    skeleton: Optional[Skeleton],
    tx: optax.GradientTransformation,
    n_steps: int,
    donate: bool = False,
):
    """Megastep: ``n_steps`` full optimizer updates fused into ONE
    compiled program via ``lax.scan`` over stacked batches.

    Semantics are identical to calling :func:`make_train_step`'s step
    ``n_steps`` times (same rng threading: split once per inner step),
    but the host dispatches once per K steps — on backends where
    dispatch rides a tunnel/RPC boundary this removes K-1 round trips
    per call. The learning rate is a single scalar for the whole call
    (host schedulers change it at epoch granularity only).

    Returns step(state, x_stack, y_stack, lr) -> (state, metrics) where
    x_stack/y_stack lead with the step axis (n_steps, B, ...) and every
    metric comes back stacked (n_steps,).
    """

    def loss_fn(params, pose_2d, pose_3d, dropout_rng):
        prediction = apply_fn(
            params,
            pose_2d,
            deterministic=False,
            rngs={"dropout": dropout_rng},
        )
        total, terms = compute_loss(prediction, pose_3d, loss_cfg, skeleton)
        return total, terms

    def step(state: TrainState, x_stack, y_stack, lr):
        assert x_stack.shape[0] == n_steps, (
            f"stacked batch leads with {x_stack.shape[0]} steps, "
            f"megastep compiled for {n_steps}"
        )
        opt_state = state.opt_state
        set_learning_rate(opt_state, lr)

        def body(carry, xy):
            params, opt_state, rng, step_i = carry
            x, y = xy
            rng, dropout_rng = jax.random.split(rng)
            (total, terms), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params, x, y, dropout_rng)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state, rng, step_i + 1), {
                "loss": total,
                **terms,
            }

        (params, opt_state, rng, step_i), metrics = jax.lax.scan(
            body,
            (state.params, opt_state, state.rng, state.step),
            (x_stack, y_stack),
        )
        new_state = state.replace(
            step=step_i, params=params, opt_state=opt_state, rng=rng
        )
        return new_state, metrics

    donate_argnums = (0,) if donate else ()
    return jax.jit(
        step,
        donate_argnums=donate_argnums,
        compiler_options=tpu_compiler_options(),
    )


def make_eval_loss_step(
    apply_fn: Callable,
    loss_cfg: LossConfig,
    skeleton: Optional[Skeleton],
):
    """Validation-loss step (no grads, deterministic forward). ``valid``
    masks padding rows of the final batch (the reference instead lets the
    last batch be smaller, ``DataLoader(drop_last=False)``): losses are
    computed on the de-duplicated leading rows only, via a per-call
    static valid count (one retrace per distinct final-batch size)."""

    def step(params, pose_2d, pose_3d, n_valid: int):
        prediction = apply_fn(
            params, pose_2d[:n_valid], deterministic=True
        )
        total, terms = compute_loss(
            prediction, pose_3d[:n_valid], loss_cfg, skeleton
        )
        return {"loss": total, **terms}

    return jax.jit(
        step, static_argnums=(3,), compiler_options=tpu_compiler_options()
    )
