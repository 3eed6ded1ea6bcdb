"""MixSTE spatio-temporal transformer trunk (flax.linen).

TPU-first rebuild of the reference MixSTE
(``hpe/mh_so3_hpe/architectures/mix_ste.py:12-191``): alternating
spatial attention over J joints (batch folded as B*L) and temporal
attention over L frames (batch folded as B*J), depth x 2 blocks, shared
post-block LayerNorms, learned positional tables, LayerNorm+Linear head.

Numerics parity notes:
- block/shared LayerNorms use eps=1e-6 (``mix_ste.py:49``) but the head's
  LayerNorm uses the torch default eps=1e-5 (``mix_ste.py:124``);
- GELU is the exact erf form (torch ``nn.GELU`` default);
- attention scale is head_dim**-0.5, or 1/head_dim under muP — the
  wired path at ``mix_ste.py:243``; the reference's 8/head_dim
  ``MuAttention`` (``mix_ste.py:371-398``) is dead code never reached —
  overridable via qk_scale;
- residual scale is 1/sqrt(depth) under muP else 1 (``mix_ste.py:330``);
- stochastic depth rates follow linspace(0, drop_path_rate, depth).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.attention import joint_major_attention, multi_head_attention


@dataclasses.dataclass(frozen=True)
class MixSTEConfig:
    """Hyper-parameters of one MixSTE trunk (``mix_ste.py:13-29``)."""

    num_frame: int = 243
    num_joints: int = 17
    in_chans: int = 2
    out_dim: int = 3
    embed_dim: int = 512
    depth: int = 8
    num_heads: int = 8
    mlp_ratio: float = 2.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.2
    mup: bool = False
    # muP base width (reference base-shape model uses channels=64,
    # ``main_h36m_lifting.py:683-687``); the seq-len base-shape axis is
    # reproduced in the optimizer rules (train/mup.py: the temporal
    # positional table is matrix-like under width-seq base shapes)
    mup_base_width: int = 64
    # TPU policy knobs (no reference counterpart)
    dtype: jnp.dtype = jnp.float32
    # "xla" | "pallas" | "pallas_temporal" | "ring" (sequence-parallel
    # temporal attention over `ring`'s mesh axis; spatial stays on xla)
    attn_impl: str = "xla"
    # residual-stream layout:
    #   "fold"        — reference-shaped: spatial blocks fold (B*L, J, C),
    #                   temporal blocks transpose+fold (B*J, L, C) — 2
    #                   physical transposes per layer pair;
    #   "joint_major" — one persistent (B, J, L, C) stream: temporal
    #                   blocks fold contiguously (reshape only), spatial
    #                   attention runs as a multi-batch-dim einsum over
    #                   the J axis (ops/attention.joint_major_attention).
    #                   Same math (parity-tested), ~6% faster fwd+bwd at
    #                   the flagship shape on TPU (r3 layout study).
    layout: str = "fold"
    # static sharding plan for attn_impl="ring" (parallel.RingSpec)
    ring: Optional[object] = None
    # "pallas": fuse fc1+GELU+fc2 in VMEM (ops/pallas_mlp.py) — wins at
    # the flagship shapes on TPU; "xla" elsewhere (tests, tiny models)
    mlp_impl: str = "xla"
    # rematerialize blocks in the backward pass (trade FLOPs for HBM;
    # enables much larger batches at 243 frames)
    remat: bool = False
    # int8 weight+activation matmuls for the trunk's hot Dense layers
    # (serving only — see ops/quant.py); the param layout changes, so
    # float checkpoints must pass through quantize_params first
    quant: bool = False

    def drop_path_rates(self):
        return np.linspace(0.0, self.drop_path_rate, self.depth).tolist()

    @property
    def readout_div(self) -> float:
        """MuReadout width multiplier: the readout input is divided by
        fan_in/base_fan_in (mup's ``MuReadout.forward``)."""
        return (self.embed_dim / self.mup_base_width) if self.mup else 1.0


class _DenseParams(nn.Module):
    """The parameters of one ``nn.Dense`` (identical names and init),
    returned raw so the fused Pallas MLP kernel can consume them while
    checkpoints stay layout-compatible with the nn.Dense path."""

    features: int

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (in_features, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


class Mlp(nn.Module):
    """Dense -> GELU(exact) -> drop -> Dense -> drop (``mix_ste.py:194-222``).

    ``impl="pallas"`` fuses fc1+GELU+fc2 into one VMEM pass
    (``ops/pallas_mlp.py``) when the interior dropout is inactive and the
    folded row count tiles; measured faster than XLA's two GEMMs at the
    flagship shape (the (rows, hidden) intermediate skips its HBM
    round-trip). Both paths share identical parameters.
    """

    hidden_features: int
    out_features: int
    drop: float = 0.0
    dtype: jnp.dtype = jnp.float32
    impl: str = "xla"
    quant: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.quant:
            dense = _dense_cls(True)
            x = dense(self.hidden_features, dtype=self.dtype, name="fc1")(x)
            x = jax.nn.gelu(x, approximate=False)
            x = nn.Dropout(self.drop, deterministic=deterministic)(x)
            x = dense(self.out_features, dtype=self.dtype, name="fc2")(x)
            x = nn.Dropout(self.drop, deterministic=deterministic)(x)
            return x

        c_in = x.shape[-1]
        w1, b1 = _DenseParams(self.hidden_features, name="fc1")(c_in)
        w2, b2 = _DenseParams(self.out_features, name="fc2")(
            self.hidden_features
        )
        dt = self.dtype

        # fused path only under bf16 compute: the kernel's in-VMEM erf
        # approximation (1.5e-7) vanishes under bf16 rounding but would
        # show at ~1e-5 against the exact-erf fp32 reference path.
        # Symbolic leading dims (jax.export shape polymorphism) skip it:
        # the kernel grid needs a concrete row count.
        if (
            self.impl == "pallas"
            and self.dtype == jnp.bfloat16
            and (deterministic or self.drop == 0.0)
            and not any(
                jax.export.is_symbolic_dim(d) for d in x.shape[:-1]
            )
        ):
            rows = int(np.prod(x.shape[:-1]))
            from ..ops.pallas_mlp import fused_mlp, supported

            if supported(rows):
                y = fused_mlp(
                    x.reshape(rows, c_in).astype(dt),
                    w1.astype(dt),
                    b1.astype(dt),
                    w2.astype(dt),
                    b2.astype(dt),
                )
                return y.reshape(*x.shape[:-1], self.out_features)

        # nn.Dense-equivalent math (inputs/params promoted to the compute
        # dtype, bias added post-cast)
        x = x.astype(dt) @ w1.astype(dt) + b1.astype(dt)
        x = jax.nn.gelu(x, approximate=False)
        x = nn.Dropout(self.drop, deterministic=deterministic)(x)
        x = x @ w2.astype(dt) + b2.astype(dt)
        x = nn.Dropout(self.drop, deterministic=deterministic)(x)
        return x


def _dense_cls(quant: bool):
    if quant:
        from ..ops.quant import QuantDense

        return QuantDense
    return nn.Dense


class Attention(nn.Module):
    """Multi-head self-attention (``mix_ste.py:225-282``)."""

    dim: int
    num_heads: int
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    comb: bool = False
    mup: bool = False
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "xla"
    ring: Optional[object] = None  # RingSpec for attn_impl="ring"
    quant: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        head_dim = self.dim // self.num_heads
        # muP scale is 1/d (``mix_ste.py:243``); the 8/d ``MuAttention``
        # (``mix_ste.py:371-398``) is dead code never wired into Block.
        default_scale = (1.0 / head_dim) if self.mup else head_dim**-0.5
        scale = self.qk_scale or default_scale

        dense = _dense_cls(self.quant)
        qkv = dense(
            self.dim * 3, use_bias=self.qkv_bias, dtype=self.dtype, name="qkv"
        )(x)

        dropout_rng = None
        if not deterministic and self.attn_drop > 0.0:
            dropout_rng = self.make_rng("dropout")

        if x.ndim == 4:
            # joint-major layout: x is (B, J, L, C), attention over J
            # with (B, L, h) batch dims — no physical transpose of the
            # residual stream (see MixSTEConfig.layout)
            assert not self.comb and self.attn_impl in ("xla", "xla_direct"), (
                "4D joint-major attention supports only the XLA einsum path"
            )
            b, j, l, _ = x.shape
            qkv = qkv.reshape(b, j, l, 3, self.num_heads, head_dim)
            q = qkv[..., 0, :, :]
            k = qkv[..., 1, :, :]
            v = qkv[..., 2, :, :]
            out = joint_major_attention(
                q, k, v, scale,
                dropout_rate=self.attn_drop,
                dropout_rng=dropout_rng,
                deterministic=deterministic,
            )
        else:
            b, n, c = x.shape
            qkv = qkv.reshape(b, n, 3, self.num_heads, head_dim)
            qkv = jnp.transpose(qkv, (2, 0, 3, 1, 4))  # (3, B, h, N, d)
            q, k, v = qkv[0], qkv[1], qkv[2]
            out = multi_head_attention(
                q,
                k,
                v,
                scale,
                comb=self.comb,
                dropout_rate=self.attn_drop,
                dropout_rng=dropout_rng,
                deterministic=deterministic,
                impl=self.attn_impl,
                ring=self.ring,
            )
        out = dense(self.dim, dtype=self.dtype, name="proj")(out)
        out = nn.Dropout(self.proj_drop, deterministic=deterministic)(out)
        return out


class DropPath(nn.Module):
    """Per-sample stochastic depth (timm semantics; train only).

    ``rate_override`` replaces the static attribute rate and may be a
    traced scalar — the GPipe path (``parallel/flagship.py``) runs one
    SPMD stage program whose per-pair rates arrive as stacked data.

    ``keep_axes`` lists the axes the mask varies over (all others
    broadcast). The timm/reference semantics mask per row of the folded
    batch — e.g. per (b*l) row for spatial blocks on (B*L, J, C) — so a
    joint-major spatial block on (B, J, L, C) uses keep_axes=(0, 2) to
    reproduce exactly that per-(b, l) granularity."""

    rate: float
    keep_axes: tuple = (0,)

    @nn.compact
    def __call__(self, x, deterministic: bool = True, rate_override=None):
        rate = self.rate if rate_override is None else rate_override
        if deterministic or (isinstance(rate, float) and rate == 0.0):
            return x
        keep_prob = 1.0 - rate
        rng = self.make_rng("dropout")
        shape = tuple(
            x.shape[i] if i in self.keep_axes else 1 for i in range(x.ndim)
        )
        keep = jax.random.bernoulli(rng, keep_prob, shape)
        return jnp.where(keep, x / keep_prob, 0.0)


class Block(nn.Module):
    """Pre-norm attention + MLP block with residual scaling
    (``mix_ste.py:285-368``; the dormant changedim path is not used by
    any reference config and is not reproduced)."""

    dim: int
    num_heads: int
    mlp_ratio: float = 2.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    comb: bool = False
    residual_scale: float = 1.0
    mup: bool = False
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "xla"
    ring: Optional[object] = None
    mlp_impl: str = "xla"
    quant: bool = False
    # DropPath mask granularity — (0,) masks per folded-batch row (the
    # 3D layouts); joint-major 4D spatial blocks pass (0, 2) to keep the
    # reference's per-(b, l) semantics (see DropPath)
    drop_path_keep_axes: tuple = (0,)

    @nn.compact
    def __call__(self, x, deterministic: bool = True, drop_path_rate=None):
        # drop_path_rate (possibly traced) overrides the static attribute
        # — see DropPath; used by the GPipe stage program
        attn_out = Attention(
            dim=self.dim,
            num_heads=self.num_heads,
            qkv_bias=self.qkv_bias,
            qk_scale=self.qk_scale,
            attn_drop=self.attn_drop,
            proj_drop=self.drop,
            comb=self.comb,
            mup=self.mup,
            dtype=self.dtype,
            attn_impl=self.attn_impl,
            ring=self.ring,
            quant=self.quant,
            name="attn",
        )(nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x),
          deterministic)
        x = x * self.residual_scale + DropPath(
            self.drop_path, self.drop_path_keep_axes, name="drop_path1"
        )(attn_out, deterministic, drop_path_rate)
        mlp_out = Mlp(
            hidden_features=int(self.dim * self.mlp_ratio),
            out_features=self.dim,
            drop=self.drop,
            dtype=self.dtype,
            impl=self.mlp_impl,
            quant=self.quant,
            name="mlp",
        )(nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x),
          deterministic)
        x = x * self.residual_scale + DropPath(
            self.drop_path, self.drop_path_keep_axes, name="drop_path2"
        )(mlp_out, deterministic, drop_path_rate)
        return x


class MixSTE(nn.Module):
    """Full MixSTE trunk. Input (B, L, J, in_chans) -> (B, L, J, out_dim).

    ``use_patch_embed=False`` + pre-embedded input reproduces the
    BonesMixSTE trunk (``manifold_mix_ste.py:133-150``).
    ``apply_head=False`` returns trunk features for external heads
    (rMCL, ``rmcl_manifold_mix_ste.py:239-250``).
    """

    cfg: MixSTEConfig
    use_patch_embed: bool = True
    apply_head: bool = True

    def setup(self):
        cfg = self.cfg
        residual_scale = (1.0 / np.sqrt(cfg.depth)) if cfg.mup else 1.0
        dpr = cfg.drop_path_rates()

        if self.use_patch_embed:
            self.spatial_embed = nn.Dense(
                cfg.embed_dim, dtype=cfg.dtype, name="spatial_embed"
            )
        self.spatial_pos_embed = self.param(
            "spatial_pos_embed",
            nn.initializers.zeros,
            (1, cfg.num_joints, cfg.embed_dim),
        )
        self.temporal_pos_embed = self.param(
            "temporal_pos_embed",
            nn.initializers.zeros,
            (1, cfg.num_frame, cfg.embed_dim),
        )
        self.pos_drop = nn.Dropout(cfg.drop_rate)

        # "pallas_temporal": fused kernel only on the L-frame layout (the
        # HBM-heaviest attention); spatial stays on XLA — far fewer Mosaic
        # compiles than full-pallas for most of the benefit.
        # "ring": sequence-parallel temporal attention over the RingSpec
        # mesh axis; spatial (N=J, not sharded) stays on XLA.
        spatial_impl = (
            "xla"
            if cfg.attn_impl in ("pallas_temporal", "ring")
            else cfg.attn_impl
        )
        temporal_impl = (
            "pallas" if cfg.attn_impl == "pallas_temporal" else cfg.attn_impl
        )
        if cfg.attn_impl == "ring":
            assert cfg.ring is not None, (
                "attn_impl='ring' needs MixSTEConfig.ring (a RingSpec)"
            )
        if cfg.layout == "joint_major":
            assert spatial_impl in ("xla", "xla_direct"), (
                "layout='joint_major' runs spatial attention as a 4D XLA "
                f"einsum; attn_impl={cfg.attn_impl!r} is fold-layout only "
                "(use attn_impl='pallas_temporal' or 'ring' to combine a "
                "non-XLA temporal path with joint_major)"
            )
        spatial_keep_axes = (0, 2) if cfg.layout == "joint_major" else (0,)
        common = dict(
            dim=cfg.embed_dim,
            num_heads=cfg.num_heads,
            mlp_ratio=cfg.mlp_ratio,
            qkv_bias=cfg.qkv_bias,
            qk_scale=cfg.qk_scale,
            drop=cfg.drop_rate,
            attn_drop=cfg.attn_drop_rate,
            residual_scale=residual_scale,
            mup=cfg.mup,
            dtype=cfg.dtype,
            mlp_impl=cfg.mlp_impl,
            quant=cfg.quant,
        )
        # static_argnums=(2,): `deterministic` stays a python bool under
        # remat (arg 0 is self)
        block_cls = nn.remat(Block, static_argnums=(2,)) if cfg.remat else Block
        self.ste_blocks = [
            block_cls(drop_path=dpr[i], comb=False, attn_impl=spatial_impl,
                      drop_path_keep_axes=spatial_keep_axes,
                      name=f"ste_block_{i}", **common)
            for i in range(cfg.depth)
        ]
        self.tte_blocks = [
            block_cls(drop_path=dpr[i], comb=False, attn_impl=temporal_impl,
                      ring=cfg.ring if temporal_impl == "ring" else None,
                      name=f"tte_block_{i}", **common)
            for i in range(cfg.depth)
        ]
        self.spatial_norm = nn.LayerNorm(
            epsilon=1e-6, dtype=cfg.dtype, name="spatial_norm"
        )
        self.temporal_norm = nn.LayerNorm(
            epsilon=1e-6, dtype=cfg.dtype, name="temporal_norm"
        )
        if self.apply_head:
            # torch-default eps here (``mix_ste.py:123-126``)
            self.head_norm = nn.LayerNorm(
                epsilon=1e-5, dtype=cfg.dtype, name="head_norm"
            )
            self.head = nn.Dense(cfg.out_dim, dtype=cfg.dtype, name="head")

    def _spatial(self, x, i, deterministic):
        """One spatial block on (B, L, J, C): fold L into batch."""
        b, l, j, c = x.shape
        x = x.reshape(b * l, j, c)
        x = self.ste_blocks[i](x, deterministic)
        x = self.spatial_norm(x)
        return x.reshape(b, l, j, c)

    def _temporal(self, x, i, deterministic):
        """One temporal block on (B, L, J, C): fold J into batch."""
        b, l, j, c = x.shape
        x = jnp.transpose(x, (0, 2, 1, 3)).reshape(b * j, l, c)
        x = self.tte_blocks[i](x, deterministic)
        x = self.temporal_norm(x)
        return jnp.transpose(x.reshape(b, j, l, c), (0, 2, 1, 3))

    def _temporal_jm(self, x, i, deterministic):
        """One temporal block on joint-major (B, J, L, C): the fold to
        (B*J, L, C) is a contiguous reshape — no physical transpose."""
        b, j, l, c = x.shape
        z = self.tte_blocks[i](x.reshape(b * j, l, c), deterministic)
        return self.temporal_norm(z).reshape(b, j, l, c)

    def _trunk_joint_major(self, x, deterministic):
        """Joint-major trunk body: one transpose in, one out; every
        layer in between runs on a persistent (B, J, L, C) stream (the
        layer ordering and norm placement mirror the fold path /
        ``mix_ste.py:128-173`` exactly)."""
        cfg = self.cfg
        x = jnp.transpose(x, (0, 2, 1, 3))  # (B, J, L, C)
        x = self.spatial_norm(self.ste_blocks[0](x, deterministic))
        x = x + self.temporal_pos_embed.astype(cfg.dtype)
        x = self.pos_drop(x, deterministic)
        x = self._temporal_jm(x, 0, deterministic)
        for i in range(1, cfg.depth):
            x = self.spatial_norm(self.ste_blocks[i](x, deterministic))
            x = self._temporal_jm(x, i, deterministic)
        return jnp.transpose(x, (0, 2, 1, 3))

    def trunk(self, x, deterministic: bool = True):
        """(B, L, J, C_in) -> (B, L, J, embed_dim) features."""
        cfg = self.cfg
        b, l, j, _ = x.shape
        assert l == cfg.num_frame, f"expected {cfg.num_frame} frames, got {l}"
        assert j == cfg.num_joints, f"expected {cfg.num_joints} joints, got {j}"

        x = x.astype(cfg.dtype)
        if self.use_patch_embed:
            x = self.spatial_embed(x)
        # STE_forward (``mix_ste.py:128-145``). Cast the fp32 positional
        # tables to the compute dtype — otherwise the add silently promotes
        # the whole residual stream to fp32 under bf16 policy.
        x = x + self.spatial_pos_embed.astype(cfg.dtype)
        x = self.pos_drop(x, deterministic)
        if cfg.layout == "joint_major":
            return self._trunk_joint_major(x, deterministic)
        x = self._spatial(x, 0, deterministic)
        # TTE_foward (``mix_ste.py:147-155``)
        c = x.shape[-1]
        x = jnp.transpose(x, (0, 2, 1, 3))  # (B, J, L, C)
        x = x + self.temporal_pos_embed.astype(cfg.dtype)
        x = self.pos_drop(x, deterministic).reshape(b * j, l, c)
        x = self.tte_blocks[0](x, deterministic)
        x = self.temporal_norm(x)
        x = jnp.transpose(x.reshape(b, j, l, c), (0, 2, 1, 3))
        # ST_foward (``mix_ste.py:157-173``)
        for i in range(1, cfg.depth):
            x = self._spatial(x, i, deterministic)
            x = self._temporal(x, i, deterministic)
        return x

    def __call__(self, x, deterministic: bool = True):
        x = self.trunk(x, deterministic)
        if self.apply_head:
            x = self.head_norm(x)
            if self.cfg.mup:
                x = x / self.cfg.readout_div  # MuReadout input scaling
            x = self.head(x)
        return x
