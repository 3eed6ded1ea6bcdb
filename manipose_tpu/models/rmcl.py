"""rMCL multi-hypothesis manifold model: K scored hypotheses + WTA.

Rebuild of ``hpe/mh_so3_hpe/architectures/rmcl_manifold_mix_ste.py``.
TPU-first difference: the reference loops K independent ``MCLHead``
modules in Python (``rmcl_manifold_mix_ste.py:251-256``); here all K
heads are one stacked-parameter einsum (``MCLHeads``) — a single MXU
matmul over the hypothesis axis. Hypothesis aggregation (weighted
average / best-score / oracle) is provided as pure functions.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..geometry.skeleton import Skeleton
from ..metrics.losses import wta_l2_loss_and_activate_head
from .decoder import decode_poses
from .manifold import BonesMixSTE, ManifoldConfig
from .mix_ste import MixSTE


class MCLHeads(nn.Module):
    """K fused MCL heads (``rmcl_manifold_mix_ste.py:267-298``).

    Per head: LayerNorm (torch-default eps=1e-5) -> Linear(C -> out+1);
    the first ``out`` channels are the prediction, the last channel per
    joint feeds a Linear(J -> 1) score head. Parameters are stored
    per-head-stacked and applied with one einsum each.
    """

    n_hyp: int
    embed_dim: int
    out_dim: int
    num_joints: int
    dtype: jnp.dtype = jnp.float32
    # muP: prediction heads are MuReadouts over the (scaling) embed dim;
    # the score head's fan_in is num_joints (fixed) so it is untouched.
    mup: bool = False
    mup_base_width: int = 64

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """x: (B, L, J, C) -> (preds (B, H, L, J, out), logits (B, H, L, 1))."""
        h, c, d, j = self.n_hyp, self.embed_dim, self.out_dim + 1, self.num_joints
        ln_scale = self.param("ln_scale", nn.initializers.ones, (h, c))
        ln_bias = self.param("ln_bias", nn.initializers.zeros, (h, c))
        pred_kernel = self.param(
            "pred_kernel", nn.initializers.lecun_normal(), (h, c, d)
        )
        pred_bias = self.param("pred_bias", nn.initializers.zeros, (h, d))
        score_kernel = self.param(
            "score_kernel", nn.initializers.lecun_normal(), (h, j, 1)
        )
        score_bias = self.param("score_bias", nn.initializers.zeros, (h, 1))

        x = x.astype(self.dtype)
        # LN statistics are head-independent; fold per-head affine into the
        # projection: (x_hat * s_h + b_h) @ W_h = x_hat @ (s_h * W_h) + b_h W_h
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean((x - mean) ** 2, axis=-1, keepdims=True)
        x_hat = (x - mean) * jax.lax.rsqrt(var + 1e-5)
        # MuReadout divides its ENTIRE input (x_hat*s + ln_b) by the width
        # multiplier, so under muP the folded ln_bias term divides too
        readout_div = (
            (self.embed_dim / self.mup_base_width) if self.mup else 1.0
        )
        x_hat = x_hat / readout_div

        kernel = ln_scale[:, :, None] * pred_kernel  # (H, C, D)
        bias = (
            jnp.einsum("hc,hcd->hd", ln_bias / readout_div, pred_kernel)
            + pred_bias
        )  # (H, D)
        out = (
            jnp.einsum("bljc,hcd->bhljd", x_hat, kernel)
            + bias[None, :, None, None, :]
        )  # (B, H, L, J, out+1)

        preds = out[..., :-1]  # (B, H, L, J, out)
        score_emb = out[..., -1]  # (B, H, L, J)
        logits = (
            jnp.einsum("bhlj,hjk->bhlk", score_emb, score_kernel)
            + score_bias[None, :, None, :]
        )  # (B, H, L, 1)
        return preds, logits


class RMCLRotMixSTE(nn.Module):
    """MixSTE trunk + K MCL heads, scores softmaxed across hypotheses
    (``rmcl_manifold_mix_ste.py:188-264``)."""

    cfg: ManifoldConfig

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        # Reference quirk kept: RMCLRotMixSTE's super().__init__ passes
        # positional args ending at norm_layer, so `mup` never reaches
        # the trunk (``rmcl_manifold_mix_ste.py:208-223``) — under muP
        # the rMCL rotations trunk keeps head_dim**-0.5 attention and
        # unit residual scale; only the MCL heads are MuReadouts (and the
        # segments branch, which does receive mup).
        trunk_cfg = dataclasses.replace(
            self.cfg.rot_trunk_config(), mup=False
        )
        feats = MixSTE(trunk_cfg, apply_head=False, name="trunk")(
            x, deterministic
        )  # (B, L, J, C)
        preds, logits = MCLHeads(
            n_hyp=self.cfg.n_hyp,
            embed_dim=self.cfg.embed_dim_rot,
            out_dim=self.cfg.rot_rep_dim,
            num_joints=self.cfg.num_joints,
            dtype=self.cfg.dtype,
            mup=self.cfg.mup,
            mup_base_width=self.cfg.mup_base_width,
            name="heads",
        )(feats)
        scores = jax.nn.softmax(logits, axis=1)  # over hypotheses (:261-264)
        return preds, scores


class RMCLManifoldMixSTE(nn.Module):
    """Full multi-hypothesis manifold model
    (``rmcl_manifold_mix_ste.py:15-106``).

    Input (B, L, J, 2) -> (poses (B, H, L, J, 3), scores (B, H, L, 1)).
    All hypotheses share the segments branch's bone lengths.
    """

    cfg: ManifoldConfig
    skeleton: Skeleton

    def setup(self):
        self.rotations_module = RMCLRotMixSTE(self.cfg, name="rotations_module")
        self.segments_module = BonesMixSTE(self.cfg, name="segments_module")

    def __call__(self, x, deterministic: bool = True):
        rotations, scores = self.rotations_module(x, deterministic)
        bones = self.segments_module(x, deterministic)  # (B, S, 1)
        lengths = bones[:, None, None, :, 0]  # (B, 1, 1, S) over (H, L)
        roots = jnp.zeros(rotations.shape[:-2] + (3,), rotations.dtype)
        poses = decode_poses(
            rotations, lengths, roots, self.skeleton, self.cfg.rot_rep_dim
        )
        return poses, scores


# ---------------------------------------------------------------------------
# Hypothesis aggregation (pure functions; reference methods
# ``rmcl_manifold_mix_ste.py:108-185``)
# ---------------------------------------------------------------------------

def concat_hyp_and_scores(
    hypothesis: jnp.ndarray, scores: jnp.ndarray
) -> jnp.ndarray:
    """(B,H,L,J,3)+(B,H,L,1) -> (B,H,L,J,4) (``:108-119``)."""
    expanded = jnp.broadcast_to(
        scores[:, :, :, None, :], hypothesis.shape[:-1] + (1,)
    )
    return jnp.concatenate([hypothesis, expanded], axis=-1)


def poses_from_hyp_idx(
    hypothesis: jnp.ndarray, hyp_indices: jnp.ndarray
) -> jnp.ndarray:
    """Gather one hypothesis per (batch, frame) (``:121-139``).

    hypothesis: (B, H, L, J, 3); hyp_indices: (B, L) -> (B, L, J, 3).
    """
    idx = hyp_indices[:, None, :, None, None]
    return jnp.take_along_axis(hypothesis, idx, axis=1)[:, 0]


def aggregate_hypotheses(
    hypothesis: jnp.ndarray,
    scores: Optional[jnp.ndarray] = None,
    mode: str = "weighted_ave",
    ground_truth: Optional[jnp.ndarray] = None,
):
    """Aggregate K hypotheses into one pose (``:141-185``).

    - ``weighted_ave``: score-weighted mean over H (the default eval path)
    - ``best_score``: argmax-score hypothesis per (B, L)
    - ``oracle``: WTA winner vs ground truth; returns (unagg_mpjpe, poses)
    """
    if mode == "best_score":
        assert scores is not None, "Scores required for best_score mode."
        best_idx = jnp.argmax(scores, axis=1)[..., 0]  # (B, L)
        return poses_from_hyp_idx(hypothesis, best_idx)
    if mode == "weighted_ave":
        assert scores is not None, "Scores required for weighted average."
        return jnp.sum(hypothesis * scores[..., None], axis=1)
    if mode == "oracle":
        assert ground_truth is not None, "Ground truth required for oracle."
        oracle_mpjpe, oracle_idx = wta_l2_loss_and_activate_head(
            hypothesis=hypothesis, y=ground_truth, squared=False, weights=None
        )
        return oracle_mpjpe, poses_from_hyp_idx(hypothesis, oracle_idx)
    raise ValueError(
        f"Only best_score, weighted_ave and oracle modes are implemented. Got {mode}."
    )
