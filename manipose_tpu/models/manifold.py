"""Manifold-constrained MixSTE: rotations branch + segments branch + FK.

Rebuild of ``hpe/mh_so3_hpe/architectures/manifold_mix_ste.py``. The
rotations branch is a full MixSTE emitting a 6D/4D rotation per joint per
frame; the segments branch (BonesMixSTE) emits one length per bone per
sequence (temporal mean); the decoder rolls out forward kinematics so
every output pose lies on the constant-bone-length manifold.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from ..geometry.skeleton import Skeleton
from .decoder import decode_poses
from .mix_ste import MixSTE, MixSTEConfig


@dataclasses.dataclass(frozen=True)
class ManifoldConfig:
    """Mirrors ``ManifoldMixSTE.__init__`` (``manifold_mix_ste.py:11-33``)."""

    num_frame: int = 243
    num_joints: int = 17
    num_bones: int = 16
    in_chans: int = 2
    rot_rep_dim: int = 6
    embed_dim_rot: int = 512
    depth_rot: int = 8
    num_heads_rot: int = 8
    embed_dim_seg: int = 128
    depth_seg: int = 2
    num_heads_seg: int = 8
    mlp_ratio: float = 2.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.2
    n_hyp: int = 5  # used by the rMCL subclass only
    mup: bool = False
    mup_base_width: int = 64
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "xla"
    ring: Optional[object] = None  # RingSpec when attn_impl="ring"
    mlp_impl: str = "xla"
    layout: str = "fold"  # "joint_major": transpose-free residual stream
    remat: bool = False
    quant: bool = False

    def rot_trunk_config(self) -> MixSTEConfig:
        return MixSTEConfig(
            num_frame=self.num_frame,
            num_joints=self.num_joints,
            in_chans=self.in_chans,
            out_dim=self.rot_rep_dim,
            embed_dim=self.embed_dim_rot,
            depth=self.depth_rot,
            num_heads=self.num_heads_rot,
            mlp_ratio=self.mlp_ratio,
            qkv_bias=self.qkv_bias,
            qk_scale=self.qk_scale,
            drop_rate=self.drop_rate,
            attn_drop_rate=self.attn_drop_rate,
            drop_path_rate=self.drop_path_rate,
            mup=self.mup,
            mup_base_width=self.mup_base_width,
            dtype=self.dtype,
            attn_impl=self.attn_impl,
            ring=self.ring,
            mlp_impl=self.mlp_impl,
            layout=self.layout,
            remat=self.remat,
            quant=self.quant,
        )

    def seg_trunk_config(self) -> MixSTEConfig:
        # BonesMixSTE passes num_bones as the trunk's "joints"
        # (``manifold_mix_ste.py:111-127``).
        return MixSTEConfig(
            num_frame=self.num_frame,
            num_joints=self.num_bones,
            in_chans=self.in_chans,
            out_dim=1,
            embed_dim=self.embed_dim_seg,
            depth=self.depth_seg,
            num_heads=self.num_heads_seg,
            mlp_ratio=self.mlp_ratio,
            qkv_bias=self.qkv_bias,
            qk_scale=self.qk_scale,
            drop_rate=self.drop_rate,
            attn_drop_rate=self.attn_drop_rate,
            drop_path_rate=self.drop_path_rate,
            mup=self.mup,
            mup_base_width=self.mup_base_width,
            dtype=self.dtype,
            attn_impl=self.attn_impl,
            ring=self.ring,
            mlp_impl=self.mlp_impl,
            layout=self.layout,
            remat=self.remat,
            quant=self.quant,
        )


class BonesMixSTE(nn.Module):
    """Segments branch (``manifold_mix_ste.py:91-154``): a joint->segment
    linear lifting replaces the patch embedding, then a small MixSTE trunk
    predicts one scalar per segment per frame, averaged over time."""

    cfg: ManifoldConfig

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        cfg = self.cfg
        b, l, j, c_in = x.shape
        # (B, L, J*C) -> (B, L, S*embed) -> (B, L, S, embed)
        x = x.reshape(b, l, j * c_in).astype(cfg.dtype)
        x = nn.Dense(
            cfg.num_bones * cfg.embed_dim_seg,
            dtype=cfg.dtype,
            name="joints_to_segments_proj",
        )(x)
        x = x.reshape(b, l, cfg.num_bones, cfg.embed_dim_seg)
        x = MixSTE(cfg.seg_trunk_config(), use_patch_embed=False, name="trunk")(
            x, deterministic
        )  # (B, L, S, 1)
        return jnp.mean(x, axis=1)  # (B, S, 1) — temporal mean (:152-153)


class ManifoldMixSTE(nn.Module):
    """Single-hypothesis manifold-constrained model
    (``manifold_mix_ste.py:10-88``). Input (B, L, J, 2) -> (B, L, J, 3)."""

    cfg: ManifoldConfig
    skeleton: Skeleton

    def setup(self):
        self.rotations_module = MixSTE(
            self.cfg.rot_trunk_config(), name="rotations_module"
        )
        self.segments_module = BonesMixSTE(self.cfg, name="segments_module")

    def __call__(self, x, deterministic: bool = True):
        rotations = self.rotations_module(x, deterministic)  # (B, L, J, 6)
        bones = self.segments_module(x, deterministic)  # (B, S, 1)
        # Root pinned to the origin (``manifold_mix_ste.py:80-81``);
        # one bone-length set broadcast over time.
        lengths = jnp.swapaxes(bones, 1, 2)  # (B, 1, S)
        roots = jnp.zeros(rotations.shape[:-2] + (3,), rotations.dtype)
        return decode_poses(
            rotations, lengths, roots, self.skeleton, self.cfg.rot_rep_dim
        )
