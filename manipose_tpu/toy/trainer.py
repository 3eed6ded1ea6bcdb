"""Toy trainer: epoch loop, per-model loss dispatch, early stopping.

Rebuild of ``toy_experiment/training/trainer.py`` on jitted steps.
Semantics kept: MSE loss for plain models (wrapped through the
torus->joints map in the 3D scenarios), custom WTA+BCE loss for rMCL,
diffusion's own loss; ReduceLROnPlateau stepped with the best validation
loss; best-val weights restored after training.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..train.optim import ReduceLROnPlateau, make_optimizer
from .models import (
    aggregate_toy_hypotheses,
    torus_points_to_joints,
    wta_with_scoring_l2_loss,
    wta_with_scoring_l2_loss_v2,
)


@dataclasses.dataclass
class ToyTrainerConfig:
    epochs: int = 200
    batch_size: int = 100
    lr: float = 1e-3
    lr_scheduler: bool = True
    lr_min: float = 0.0
    lr_patience: int = 10
    lr_threshold: float = 1e-4
    seed: int = 42


class ToyTrainer:
    """Generic toy trainer.

    model_kind: "plain" | "mcl" | "diffusion"; enabled_3d selects the
    torus joint-space loss wrapping (``trainer.py:83-90,104-110``).
    """

    def __init__(
        self,
        model,
        variables,
        cfg: ToyTrainerConfig,
        model_kind: str = "plain",
        enabled_3d: bool = False,
        joints_prediction: bool = True,
        beta: float = 0.1,
        major_radius: float = 2.0,
        minor_radius: float = 1.0,
    ):
        self.model = model
        self.variables = variables
        self.cfg = cfg
        self.model_kind = model_kind
        self.enabled_3d = enabled_3d
        self.joints_prediction = joints_prediction
        self.beta = beta
        self.major_radius = major_radius
        self.minor_radius = minor_radius
        self.loss_list = []
        self.val_loss_list = []

        self.tx = make_optimizer(weight_decay=0.0)
        self.opt_state = self.tx.init(variables["params"])
        self.scheduler = (
            ReduceLROnPlateau(
                cfg.lr,
                factor=0.5,
                patience=cfg.lr_patience,
                threshold=cfg.lr_threshold,
                min_lr=cfg.lr_min,
            )
            if cfg.lr_scheduler
            else None
        )
        self._train_step = jax.jit(self._make_train_step())
        self._eval_loss = jax.jit(self._make_loss_eval())
        self._rng = jax.random.PRNGKey(cfg.seed)

    # ------------------------------------------------------------------
    def _supervised_loss(self, pred, y):
        """MSE; in 3D wrapped through the joints map
        (``trainer.py:83-90``)."""
        if not self.enabled_3d:
            return jnp.mean((pred - y) ** 2)
        y1, y2 = torus_points_to_joints(y, self.major_radius, self.minor_radius)
        if self.joints_prediction:
            p1, p2 = pred[:, :3], pred[:, 3:]
        else:
            p1, p2 = torus_points_to_joints(
                pred, self.major_radius, self.minor_radius
            )
        return 0.5 * (jnp.mean((p1 - y1) ** 2) + jnp.mean((p2 - y2) ** 2))

    def _model_loss(self, params, batch_stats, x, y, rng, train):
        variables = {"params": params, **batch_stats}
        mutable = ["batch_stats"] if (train and "batch_stats" in batch_stats) else False
        if self.model_kind == "diffusion":
            out = self.model.apply(
                variables, x, y, train, rngs={"diffusion": rng},
                method=self.model.calc_loss, mutable=mutable,
            )
        else:
            out = self.model.apply(variables, x, train=train, mutable=mutable)
        if mutable:
            pred, new_stats = out
        else:
            pred, new_stats = out, batch_stats
        if self.model_kind == "diffusion":
            loss = pred  # calc_loss returns the loss directly
        elif self.model_kind == "mcl":
            if self.enabled_3d:
                loss = wta_with_scoring_l2_loss_v2(
                    pred, y, self.beta, self.major_radius, self.minor_radius
                )
            else:
                loss = wta_with_scoring_l2_loss(pred, y, self.beta)
        else:
            loss = self._supervised_loss(pred, y)
        return loss, new_stats

    def _make_train_step(self):
        def step(params, batch_stats, opt_state, x, y, lr, rng):
            (loss, new_stats), grads = jax.value_and_grad(
                self._model_loss, has_aux=True
            )(params, batch_stats, x, y, rng, True)
            opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, new_stats, opt_state, loss

        return step

    def _make_loss_eval(self):
        """Validation loss mirrors the reference early-stopping criterion
        (``trainer.py:160-163``): the supervised loss on the *aggregated*
        prediction — not the training WTA/denoising loss."""

        def eval_loss(params, batch_stats, x, y, rng):
            variables = {"params": params, **batch_stats}
            if self.model_kind == "diffusion":
                hyps = self.model.apply(
                    variables, x, rngs={"diffusion": rng},
                    method=self.model.sample_hypotheses,
                )
                pred = jnp.mean(hyps, axis=1)
            elif self.model_kind == "mcl":
                hyps = self.model.apply(variables, x, train=False)
                pred = aggregate_toy_hypotheses(hyps)
            else:
                pred = self.model.apply(variables, x, train=False)
            return self._supervised_loss(pred, y)

        return eval_loss

    # ------------------------------------------------------------------
    def train(self, train_data: Tuple[np.ndarray, np.ndarray],
              val_data: Optional[Tuple[np.ndarray, np.ndarray]] = None):
        x_train, y_train = train_data
        n = x_train.shape[0]
        params = self.variables["params"]
        batch_stats = {
            k: v for k, v in self.variables.items() if k != "params"
        }
        best_val = np.inf
        best_params = params
        best_stats = batch_stats
        rng = np.random.default_rng(self.cfg.seed)

        for epoch in range(1, self.cfg.epochs + 1):
            order = rng.permutation(n)
            losses = []
            for start in range(0, n, self.cfg.batch_size):
                idx = order[start : start + self.cfg.batch_size]
                if len(idx) < 2:  # BatchNorm needs > 1 sample
                    continue
                self._rng, step_rng = jax.random.split(self._rng)
                lr = self.scheduler.lr if self.scheduler else self.cfg.lr
                params, batch_stats, self.opt_state, loss = self._train_step(
                    params, batch_stats, self.opt_state,
                    jnp.asarray(x_train[idx]), jnp.asarray(y_train[idx]),
                    lr, step_rng,
                )
                losses.append(float(loss))
            self.loss_list.append(float(np.mean(losses)))

            if val_data is not None:
                self._rng, val_rng = jax.random.split(self._rng)
                val_loss = float(
                    self._eval_loss(
                        params, batch_stats,
                        jnp.asarray(val_data[0]), jnp.asarray(val_data[1]),
                        val_rng,
                    )
                )
                self.val_loss_list.append(val_loss)
                if val_loss < best_val:
                    best_val = val_loss
                    best_params, best_stats = params, batch_stats
                if self.scheduler is not None:
                    self.scheduler.step(best_val)

        # reload best-val weights (``trainer.py:196-201``)
        if val_data is not None:
            params, batch_stats = best_params, best_stats
        self.variables = {"params": params, **batch_stats}
        return self.variables

    # ------------------------------------------------------------------
    def predict(self, x: np.ndarray, n_samples: Optional[int] = None):
        """Forward in eval mode; returns hypotheses for mcl/diffusion."""
        if self.model_kind == "diffusion":
            self._rng, rng = jax.random.split(self._rng)
            return np.asarray(
                self.model.apply(
                    self.variables, jnp.asarray(x), n_samples,
                    rngs={"diffusion": rng},
                    method=self.model.sample_hypotheses,
                )
            )
        return np.asarray(
            self.model.apply(self.variables, jnp.asarray(x), train=False)
        )

    def evaluate(self, eval_sets, metric: Callable, **metric_kwargs):
        """(``trainer.py:203-236``): aggregate hypotheses then score.

        Returns (performances, aggregated predictions, hypotheses-or-None);
        metrics are computed on the aggregated predictions.
        """
        performances, predictions, hypotheses = [], [], []
        for x_eval, y_eval in eval_sets:
            out = self.predict(x_eval)
            if self.model_kind in ("mcl", "diffusion"):
                hypotheses.append(out)
                if self.model_kind == "diffusion":
                    preds = out.mean(axis=1)
                else:
                    preds = np.asarray(
                        aggregate_toy_hypotheses(jnp.asarray(out))
                    )
            else:
                preds = out
            predictions.append(preds)
            try:
                perf = metric(preds, y_eval, **metric_kwargs)
            except TypeError:
                perf = metric(preds)
            performances.append(perf)
        return performances, predictions, hypotheses or None
