"""Toy conditional DDPM baseline (``toy_experiment/models/diffusion/``).

DDPM over the 2D target conditioned on the 1D input: quad/linear/cosine
noise schedules, sinusoidal step embedding, noise-prediction MSE loss,
ancestral sampling producing K hypothesis samples. The reference's
per-sample Python sampling loop (``diffusion.py:120-163``) becomes a
``lax.fori_loop`` inside one jitted graph with all samples drawn at once.
"""

from __future__ import annotations

import math
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def compute_noise_scheduling(
    schedule: str, beta_start: float, beta_end: float, num_steps: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(``diffusion/utils.py:35-71``). Returns (beta, alpha=cumprod,
    alpha_hat=1-beta, sigma)."""
    if schedule == "quad":
        beta = np.linspace(beta_start**0.5, beta_end**0.5, num_steps) ** 2
    elif schedule == "linear":
        beta = np.linspace(beta_start, beta_end, num_steps)
    elif schedule == "cosine":
        def alpha_bar(t):
            return math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2

        beta = np.array(
            [
                min(
                    1 - alpha_bar((i + 1) / num_steps) / alpha_bar(i / num_steps),
                    beta_end,
                )
                for i in range(num_steps)
            ]
        )
    else:
        raise ValueError(f"unknown schedule: {schedule}")
    alpha_hat = 1 - beta
    alpha = np.cumprod(alpha_hat)
    sigma = ((1.0 - alpha[:-1]) / (1.0 - alpha[1:]) * beta[1:]) ** 0.5
    return beta, alpha, alpha_hat, sigma


def _build_step_embedding(num_steps: int, dim: int) -> np.ndarray:
    """Sinusoidal table (``diffusion/utils.py:103-113``)."""
    steps = np.arange(num_steps)[:, None]
    frequencies = 10.0 ** (np.arange(dim) / (dim - 1) * 4.0)[None]
    table = steps * frequencies
    return np.concatenate([np.sin(table), np.cos(table)], axis=1)


class DiffusionEmbedding(nn.Module):
    """Projected sinusoidal step embedding (``utils.py:76-113``)."""

    num_steps: int
    embedding_dim: int = 128

    @nn.compact
    def __call__(self, step):
        table = jnp.asarray(
            _build_step_embedding(self.num_steps, self.embedding_dim // 2),
            jnp.float32,
        )
        x = table[step]
        x = nn.Dense(self.embedding_dim, name="projection1")(x)
        x = jax.nn.silu(x)
        x = nn.Dense(self.embedding_dim, name="projection2")(x)
        return jax.nn.silu(x)


class DiffMlp(nn.Module):
    """MLP trunk + step embedding added after fc_in (``diff_mlp.py:8-41``)."""

    hidden_features: int
    out_features: int
    n_layers: int
    num_diff_steps: int
    act: Callable = jnp.tanh

    @nn.compact
    def __call__(self, x, step, train: bool = False):
        def block(x, name):
            x = nn.Dense(self.hidden_features, name=f"{name}_dense")(x)
            x = self.act(x)
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                name=f"{name}_bn",
            )(x)
            return x

        x = block(x, "fc_in")
        x = x + DiffusionEmbedding(
            self.num_diff_steps, self.hidden_features, name="step_enc"
        )(step)
        for i in range(self.n_layers):
            x = block(x, f"fcs_{i}")
        return nn.Dense(self.out_features, name="fc_out")(x)


class LiftingDiffusionModel(nn.Module):
    """Conditional DDPM x(1D) -> y(2D) (``diffusion/diffusion.py:14-176``).

    Conditioning: concat (``conditioners/raw_2d.py:27-38``).
    """

    hidden_features: int = 32
    n_layers: int = 2
    num_steps: int = 50
    schedule: str = "cosine"
    beta_start: float = 0.0001
    beta_end: float = 0.5
    n_samples: int = 5
    act: Callable = jnp.tanh

    def setup(self):
        beta, alpha, alpha_hat, sigma = compute_noise_scheduling(
            self.schedule, self.beta_start, self.beta_end, self.num_steps
        )
        self.beta_arr = jnp.asarray(beta, jnp.float32)
        self.alpha_arr = jnp.asarray(alpha, jnp.float32)
        self.alpha_hat_arr = jnp.asarray(alpha_hat, jnp.float32)
        self.sigma_arr = jnp.asarray(sigma, jnp.float32)
        self.diffmodel = DiffMlp(
            hidden_features=self.hidden_features,
            out_features=2,
            n_layers=self.n_layers,
            num_diff_steps=self.num_steps,
            act=self.act,
            name="diffmodel",
        )

    def __call__(self, x_1d, y_2d, train: bool = False):
        return self.calc_loss(x_1d, y_2d, train)

    def calc_loss(self, x_1d, y_2d, train: bool = False):
        """Noise-prediction MSE (``diffusion.py:89-118``)."""
        rng = self.make_rng("diffusion")
        t_rng, noise_rng = jax.random.split(rng)
        b = y_2d.shape[0]
        t = jax.random.randint(t_rng, (b,), 0, self.num_steps)
        current_alpha = self.alpha_arr[t][:, None]
        noise = jax.random.normal(noise_rng, y_2d.shape)
        noisy = jnp.sqrt(current_alpha) * y_2d + jnp.sqrt(1 - current_alpha) * noise
        total_input = jnp.concatenate([noisy, x_1d], axis=1)
        predicted = self.diffmodel(total_input, t, train)
        return jnp.mean((noise - predicted) ** 2)

    def sample_hypotheses(self, x_1d, n_samples: int = None):
        """Ancestral sampling -> (B, n_samples, 2) (``diffusion.py:120-163``)."""
        n_samples = n_samples or self.n_samples
        rng = self.make_rng("diffusion")
        b = x_1d.shape[0]
        init_rng, loop_rng = jax.random.split(rng)
        # all hypotheses at once: fold sample axis into batch
        target = jax.random.normal(init_rng, (b * n_samples, 2))
        cond = jnp.repeat(x_1d, n_samples, axis=0)

        def body(i, carry):
            target, rng = carry
            t = self.num_steps - 1 - i
            diff_input = jnp.concatenate([target, cond], axis=1)
            predicted_noise = self.diffmodel(
                diff_input, jnp.full((target.shape[0],), t), False
            )
            coeff1 = 1.0 / jnp.sqrt(self.alpha_hat_arr[t])
            coeff2 = (1 - self.alpha_hat_arr[t]) / jnp.sqrt(1 - self.alpha_arr[t])
            mean = coeff1 * (target - coeff2 * predicted_noise)
            rng, noise_rng = jax.random.split(rng)
            noise = jax.random.normal(noise_rng, mean.shape)
            sigma = jnp.where(t > 0, self.sigma_arr[jnp.maximum(t - 1, 0)], 0.0)
            return mean + sigma * noise, rng

        final, _ = jax.lax.fori_loop(0, self.num_steps, body, (target, loop_rng))
        return final.reshape(b, n_samples, 2)
