"""Toy models: MLP, constrained circle/torus MLPs, rMCL variants.

Rebuild of ``toy_experiment/models/`` in flax. The K rMCL heads are one
stacked-parameter dense (vs the reference's Python ModuleList loop,
``constrained_mlp_rmcl.py:36-40``).
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def squared_relu(x):
    """(``models/squared_relu.py:6-11``)"""
    return jnp.square(jax.nn.relu(x))


ACTIVATIONS = {
    "relu": jax.nn.relu,
    "tanh": jnp.tanh,
    "sqrelu": squared_relu,
}


def torus_points_to_joints(points, major_radius=2.0, minor_radius=1.0):
    """Torus point -> (joint1 on the big circle, joint2 = point)
    (``training/metrics.py:96-109``). points: (..., 3)."""
    norm_xy = jnp.sqrt(points[..., 0] ** 2 + points[..., 1] ** 2)[..., None]
    joint1 = major_radius * points[..., :2] / norm_xy
    joint1 = jnp.concatenate(
        [joint1, jnp.zeros(points.shape[:-1] + (1,), points.dtype)], axis=-1
    )
    return joint1, points


def torus_angles_to_cartesian(major_radius, minor_radius, angles):
    """angles (..., 2) -> (..., 3) (``constrained_mlp.py:55-64``)."""
    x = (major_radius + minor_radius * jnp.cos(angles[..., 0])) * jnp.cos(
        angles[..., 1]
    )
    y = (major_radius + minor_radius * jnp.cos(angles[..., 0])) * jnp.sin(
        angles[..., 1]
    )
    z = minor_radius * jnp.sin(angles[..., 0])
    return jnp.stack((x, y, z), axis=-1)


class ToyMlp(nn.Module):
    """Dense+act+BatchNorm stacks + linear head (``models/mlp.py:5-39``).

    torch BatchNorm1d semantics: eps=1e-5; running stats are used at eval
    (flax ``use_running_average``), updated during training.
    """

    hidden_features: int
    out_features: int
    n_layers: int
    act: Callable = jnp.tanh

    @nn.compact
    def __call__(self, x, train: bool = False):
        def block(x, name):
            x = nn.Dense(self.hidden_features, name=f"{name}_dense")(x)
            x = self.act(x)
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                name=f"{name}_bn",
            )(x)
            return x

        x = block(x, "fc_in")
        for i in range(self.n_layers):
            x = block(x, f"fcs_{i}")
        return nn.Dense(self.out_features, name="fc_out")(x)


class ToyTrunk(nn.Module):
    """The Mlp minus its output head (shared by the rMCL variants)."""

    hidden_features: int
    n_layers: int
    act: Callable = jnp.tanh

    @nn.compact
    def __call__(self, x, train: bool = False):
        def block(x, name):
            x = nn.Dense(self.hidden_features, name=f"{name}_dense")(x)
            x = self.act(x)
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                name=f"{name}_bn",
            )(x)
            return x

        x = block(x, "fc_in")
        for i in range(self.n_layers):
            x = block(x, f"fcs_{i}")
        return x


class ConstrainedMlp(nn.Module):
    """Predict theta -> point on the circle (``constrained_mlp.py:9-35``)."""

    hidden_features: int
    n_layers: int
    act: Callable = jnp.tanh
    radius: float = 1.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        theta = ToyMlp(
            self.hidden_features, 1, self.n_layers, self.act, name="mlp"
        )(x, train)
        return jnp.concatenate(
            [self.radius * jnp.cos(theta), self.radius * jnp.sin(theta)], axis=1
        )


class ConstrainedMlpV2(nn.Module):
    """Predict 2 angles -> point on the torus (``constrained_mlp.py:37-68``)."""

    hidden_features: int
    n_layers: int
    act: Callable = jnp.tanh
    major_radius: float = 1.0
    minor_radius: float = 1.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        angles = ToyMlp(
            self.hidden_features, 2, self.n_layers, self.act, name="mlp"
        )(x, train)
        return torus_angles_to_cartesian(
            self.major_radius, self.minor_radius, angles
        )


class _StackedHeads(nn.Module):
    """K heads Dense(hidden -> out+1), stacked params, one einsum."""

    n_hyp: int
    out_dim: int  # without the score channel

    @nn.compact
    def __call__(self, x):  # x: (B, hidden)
        h, d = self.n_hyp, self.out_dim + 1
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (h, x.shape[-1], d)
        )
        bias = self.param("bias", nn.initializers.zeros, (h, d))
        return jnp.einsum("bc,hcd->bhd", x, kernel) + bias  # (B, H, out+1)


class ConstrainedMlpRmcl(nn.Module):
    """K circle hypotheses + scores (``constrained_mlp_rmcl.py:8-59``).

    Output (B, H, 3): (x, y, score) with scores softmaxed over H.
    """

    hidden_features: int
    n_layers: int
    act: Callable = jnp.tanh
    radius: float = 1.0
    n_hyp: int = 5
    beta: float = 1.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = ToyTrunk(
            self.hidden_features, self.n_layers, self.act, name="trunk"
        )(x, train)
        out = _StackedHeads(self.n_hyp, 1, name="heads")(feats)  # (B, H, 2)
        theta = out[..., 0]
        logits = out[..., 1]
        scores = jax.nn.softmax(logits, axis=1)
        return jnp.stack(
            [
                self.radius * jnp.cos(theta),
                self.radius * jnp.sin(theta),
                scores,
            ],
            axis=-1,
        )


class ConstrainedMlpRmclV2(nn.Module):
    """K torus hypotheses + scores (``constrained_mlp_rmcl.py:125-183``).

    Output (B, H, 4): (x, y, z, score) with scores softmaxed over H.
    """

    hidden_features: int
    n_layers: int
    act: Callable = jnp.tanh
    major_radius: float = 1.0
    minor_radius: float = 1.0
    n_hyp: int = 5
    beta: float = 1.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = ToyTrunk(
            self.hidden_features, self.n_layers, self.act, name="trunk"
        )(x, train)
        out = _StackedHeads(self.n_hyp, 2, name="heads")(feats)  # (B, H, 3)
        angles = out[..., :2]
        logits = out[..., 2]
        points = torus_angles_to_cartesian(
            self.major_radius, self.minor_radius, angles
        )
        scores = jax.nn.softmax(logits, axis=1)
        return jnp.concatenate([points, scores[..., None]], axis=-1)


# ---- aggregation + losses (``constrained_mlp_rmcl.py:60-120,185-266``) ----

def aggregate_toy_hypotheses(hypothesis: jnp.ndarray, mode="weighted_ave"):
    """hypothesis (B, H, D+1) with trailing score channel -> (B, D)."""
    if mode == "weighted_ave":
        return jnp.sum(
            hypothesis[..., :-1] * hypothesis[..., -1:], axis=1
        )
    if mode == "best_score":
        idx = jnp.argmax(hypothesis[..., -1], axis=1)
        return jnp.take_along_axis(
            hypothesis[..., :-1], idx[:, None, None], axis=1
        )[:, 0]
    raise ValueError(f"Unknown aggregation mode: {mode}")


def _bce(probs, targets):
    log_p = jnp.clip(jnp.log(probs), -100.0, None)
    log_1p = jnp.clip(jnp.log1p(-probs), -100.0, None)
    return jnp.mean(-(targets * log_p + (1.0 - targets) * log_1p))


def wta_with_scoring_l2_loss(hypothesis, y, beta: float):
    """Circle variant (``constrained_mlp_rmcl.py:81-103``): per-hyp mean
    squared error over coords, WTA + BCE on scores."""
    preds = hypothesis[..., :-1]
    base = jnp.mean((preds - y[:, None]) ** 2, axis=2)  # (B, H)
    wta = jnp.min(base, axis=1)
    if beta == 0:
        return jnp.mean(wta)
    active = jnp.argmin(base, axis=1)
    gt_scores = jax.nn.one_hot(active, hypothesis.shape[1], dtype=hypothesis.dtype)
    return jnp.mean(wta) + beta * _bce(hypothesis[..., -1], gt_scores)


def wta_with_scoring_l2_loss_v2(
    hypothesis, y, beta: float, major_radius: float, minor_radius: float
):
    """Torus variant (``constrained_mlp_rmcl.py:205-266``): per-hyp loss is
    the mean of the two joint L2 losses after the torus->joints map."""
    preds = hypothesis[..., :3]
    h1, h2 = torus_points_to_joints(preds, major_radius, minor_radius)
    y1, y2 = torus_points_to_joints(y, major_radius, minor_radius)
    err1 = jnp.mean((h1 - y1[:, None]) ** 2, axis=2)
    err2 = jnp.mean((h2 - y2[:, None]) ** 2, axis=2)
    base = 0.5 * (err1 + err2)  # (B, H)
    wta = jnp.min(base, axis=1)
    if beta == 0:
        return jnp.mean(wta)
    active = jnp.argmin(base, axis=1)
    gt_scores = jax.nn.one_hot(active, hypothesis.shape[1], dtype=hypothesis.dtype)
    return jnp.mean(wta) + beta * _bce(hypothesis[..., -1], gt_scores)
