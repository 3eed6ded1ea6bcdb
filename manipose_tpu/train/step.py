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
from .losses import LossConfig, compute_loss
from .optim import make_optimizer


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
):
    """Build the jitted train step.

    apply_fn(params, x, deterministic, rngs) -> prediction.
    Returns step(state, pose_2d, pose_3d, lr) -> (state, metrics dict).
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

    def step(state: TrainState, pose_2d, pose_3d, lr, n_valid: int = None):
        if n_valid is not None:
            # drop duplicated padding rows of a partial final batch
            # (the reference trains on a smaller final batch instead)
            pose_2d = pose_2d[:n_valid]
            pose_3d = pose_3d[:n_valid]
        rng, dropout_rng = jax.random.split(state.rng)
        (total, terms), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, pose_2d, pose_3d, dropout_rng
        )
        opt_state = state.opt_state
        # inject_hyperparams exposes the LR as mutable state
        opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
        updates, opt_state = tx.update(grads, opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1, params=params, opt_state=opt_state, rng=rng
        )
        metrics = {"loss": total, **terms}
        return new_state, metrics

    donate_argnums = (0,) if donate else ()
    return jax.jit(step, donate_argnums=donate_argnums, static_argnums=(4,))


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

    return jax.jit(step, static_argnums=(3,))
