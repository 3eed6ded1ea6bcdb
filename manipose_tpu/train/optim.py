"""Optimizer and LR schedules with reference-exact semantics.

- torch ``Adam(weight_decay=w)`` couples decay into the gradient *before*
  the moment updates (not AdamW); the optax equivalent chains
  ``add_decayed_weights`` ahead of ``scale_by_adam``
  (``hpe/main_h36m_lifting.py:234-238``).
- Both reference schedulers step once per *validation* epoch, not per
  training epoch (``main_h36m_lifting.py:400-403`` sits inside the
  valid_epoch_interval block). The LR therefore enters the jitted step as
  a dynamic scalar driven by host-side scheduler state.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import optax


def make_adam(weight_decay: float = 1e-6) -> optax.GradientTransformation:
    """torch-semantics Adam; LR is injected per-step via inject_hyperparams."""
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        optax.scale(-1.0),  # descent; LR applied separately
    )


def make_optimizer(
    weight_decay: float = 1e-6,
    grad_clip: float = 0.0,
    skip_nonfinite: bool = False,
) -> optax.GradientTransformation:
    """Adam whose learning rate is a runtime scalar (schedulers run on host).

    Production-robustness knobs beyond the reference's bare Adam
    (``main_h36m_lifting.py:227-238``):
      grad_clip > 0       — global-norm gradient clipping
      skip_nonfinite=True — a step whose update contains any NaN/inf is
        SKIPPED entirely (params, Adam moments and decay untouched) —
        the bf16 loss-spike guard; implemented via
        ``optax.apply_if_finite``, whose wrapper state
        :func:`set_learning_rate` sees through.
    """

    def chain(learning_rate):
        parts = []
        if grad_clip > 0.0:
            parts.append(optax.clip_by_global_norm(grad_clip))
        parts += [
            optax.add_decayed_weights(weight_decay),
            optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
            optax.scale(-learning_rate),
        ]
        return optax.chain(*parts)

    tx = optax.inject_hyperparams(chain)(learning_rate=0.0)
    if skip_nonfinite:
        tx = optax.apply_if_finite(tx, max_consecutive_errors=10_000)
    return tx


def set_learning_rate(opt_state, lr) -> None:
    """Write the runtime LR into an ``inject_hyperparams`` state, seeing
    through the ``apply_if_finite`` wrapper when present (its state
    nests the injected one under ``inner_state``)."""
    import jax.numpy as jnp

    if not hasattr(opt_state, "hyperparams"):
        opt_state = opt_state.inner_state
    opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)


def lr_decay(step: int, lr: float, decay_step: int, gamma: float) -> float:
    """Exponential step decay (``hpe/mh_so3_hpe/utils.py:32-36``); the
    returned value feeds the jitted step's dynamic LR input."""
    return lr * gamma ** (step / decay_step)


class CosineAnnealingLR:
    """torch ``CosineAnnealingLR`` recurrence (closed form), stepped per
    validation epoch (``main_h36m_lifting.py:245-251,400-403``)."""

    def __init__(self, base_lr: float, t_max: int, eta_min: float = 0.0):
        self.base_lr = base_lr
        self.t_max = t_max
        self.eta_min = eta_min
        self._step = 0

    @property
    def lr(self) -> float:
        return (
            self.eta_min
            + (self.base_lr - self.eta_min)
            * (1 + math.cos(math.pi * self._step / self.t_max))
            / 2
        )

    def step(self, metric: Optional[float] = None) -> None:
        self._step += 1

    def state_dict(self):
        return {"step": self._step}

    def load_state_dict(self, state):
        self._step = state["step"]


class ReduceLROnPlateau:
    """torch ``ReduceLROnPlateau(mode=min, threshold_mode=rel)`` semantics
    (``main_h36m_lifting.py:252-260``). The reference feeds it
    ``best_valid_loss`` — replicate by passing whatever the driver passes.
    """

    def __init__(
        self,
        base_lr: float,
        factor: float = 0.5,
        patience: int = 11,
        threshold: float = 0.1,
        min_lr: float = 0.0,
    ):
        self.lr = base_lr
        self.factor = factor
        self.patience = patience
        self.threshold = threshold
        self.min_lr = min_lr
        self.best = math.inf
        self.num_bad_epochs = 0

    def step(self, metric: float) -> None:
        if metric < self.best * (1 - self.threshold):
            self.best = metric
            self.num_bad_epochs = 0
        else:
            self.num_bad_epochs += 1
        if self.num_bad_epochs > self.patience:
            self.lr = max(self.lr * self.factor, self.min_lr)
            self.num_bad_epochs = 0

    def state_dict(self):
        return {
            "lr": self.lr,
            "best": self.best,
            "num_bad_epochs": self.num_bad_epochs,
        }

    def load_state_dict(self, state):
        self.lr = state["lr"]
        self.best = state["best"]
        self.num_bad_epochs = state["num_bad_epochs"]


def make_scheduler(
    kind: str,
    base_lr: float,
    epochs: int = 200,
    n_annealing: int = 1,
    lr_min: float = 0.0,
    lr_patience: int = 11,
    lr_threshold: float = 0.1,
):
    """Factory mirroring ``main_h36m_lifting.py:244-265``."""
    if kind == "cosine":
        return CosineAnnealingLR(base_lr, t_max=epochs // n_annealing, eta_min=lr_min)
    if kind == "plateau":
        return ReduceLROnPlateau(
            base_lr,
            factor=0.5,
            patience=lr_patience,
            threshold=lr_threshold,
            min_lr=lr_min,
        )
    raise ValueError(
        f"Accepted lr_scheduler values are 'cosine' and 'plateau'. Got {kind}."
    )
