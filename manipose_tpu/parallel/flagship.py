"""GPipe pipelining of the real MixSTE trunk (config: ``parallel.pipe``).

The reference's one-flag multi-GPU story is ``nn.DataParallel``
(``hpe/main_h36m_lifting.py:747-751``); the beyond-reference equivalent
here is ``parallel.pipe: S`` — the depth-D MixSTE trunk (the flagship's
hot stack, ``mix_ste.py:157-173``) splits into S GPipe stages of D/S
(spatial, temporal) block pairs each, scheduled by
``pipeline.pipeline_apply`` over a 'pipe' mesh axis and composable with
data parallelism over 'data'.

Design notes (why this is NOT just ``model.apply`` under shard_map):

- The stage program must be ONE SPMD function. Per-pair differences —
  the temporal positional table (added only before the first temporal
  block, ``mix_ste.py:147-155``) and the linspace stochastic-depth rates
  — therefore travel as *stacked stage data*: a (S, pairs, 1, L, C)
  tpos tensor that is the real table at pair 0 and zeros elsewhere, and
  a (S, pairs) rate matrix consumed via ``Block(..., drop_path_rate=r)``
  call-time overrides (traced scalars).
- The per-stage parameter stacks are built INSIDE the jitted step from
  the standard (checkpoint-compatible) parameter pytree with
  ``jnp.stack`` / ``broadcast_to``. That makes parameter tying exact
  under AD: the shared post-block LayerNorms (``spatial_norm`` /
  ``temporal_norm``, applied after every block) are broadcast into every
  stage, and the VJP of broadcast_to sums the per-stage cotangents —
  which IS the correct gradient of a tied parameter. No manual
  grad-surgery, and checkpoints stay byte-identical with the
  single-device layout.
- Embedding + spatial positional add run before the pipeline and the
  head after it (cheap elementwise/small-GEMM work on the data-sharded
  batch); only the depth-D pair stack is staged.

``jax.grad`` through the returned apply_fn is pipelined backprop
(``pipeline.py``: the VJP of ppermute is the reverse rotation).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax.sharding import Mesh

from .pipeline import pipeline_apply

tree_map = jax.tree_util.tree_map


def _largest_divisor_leq(n: int, cap: int) -> int:
    m = max(1, min(cap, n))
    while n % m:
        m -= 1
    return m


def pick_microbatches(batch: int, data_size: int, requested: int) -> int:
    """Largest microbatch count <= requested dividing the per-data-shard
    batch (GPipe wants many microbatches; tiny debug batches clamp)."""
    assert batch % data_size == 0, (batch, data_size)
    return _largest_divisor_leq(batch // data_size, requested)


def _pipelined_trunk(
    cfg,
    mix_params: dict,
    x: jnp.ndarray,
    deterministic: bool,
    rng: Optional[jax.Array],
    mesh: Mesh,
    pipe_axis: str,
    data_axis: Optional[str],
    microbatches: int,
    use_patch_embed: bool,
):
    """(B, L, J, in) -> (B, L, J, C) features through the staged trunk.

    cfg: the trunk's MixSTEConfig; mix_params: its param dict
    (``spatial_embed`` ... ``tte_block_i`` ...), single-device layout.
    """
    from ..models.mix_ste import Block

    depth = cfg.depth
    n_stages = mesh.shape[pipe_axis]
    assert depth % n_stages == 0, (
        f"trunk depth {depth} must divide into parallel.pipe={n_stages} "
        "stages"
    )
    assert cfg.drop_rate == 0.0, (
        "pipelined trunk supports drop_rate=0 only (the positional "
        "dropout sits outside the uniform stage program; every reference "
        "config uses 0)"
    )
    assert cfg.attn_impl in ("xla",), (
        "pipelined trunk runs XLA attention inside stages "
        f"(got attn_impl={cfg.attn_impl})"
    )
    pps = depth // n_stages
    residual_scale = (1.0 / np.sqrt(depth)) if cfg.mup else 1.0

    block = Block(
        dim=cfg.embed_dim,
        num_heads=cfg.num_heads,
        mlp_ratio=cfg.mlp_ratio,
        qkv_bias=cfg.qkv_bias,
        qk_scale=cfg.qk_scale,
        drop=cfg.drop_rate,
        attn_drop=cfg.attn_drop_rate,
        drop_path=0.0,  # overridden per pair via the stacked rate matrix
        comb=False,
        residual_scale=residual_scale,
        mup=cfg.mup,
        dtype=cfg.dtype,
        attn_impl="xla",
        mlp_impl=cfg.mlp_impl,
    )
    norm = nn.LayerNorm(epsilon=1e-6, dtype=cfg.dtype)

    # ---- pre-pipeline: embed + spatial pos (``mix_ste.py:128-143``) ----
    x = x.astype(cfg.dtype)
    if use_patch_embed:
        x = jnp.dot(x, mix_params["spatial_embed"]["kernel"].astype(cfg.dtype))
        x = x + mix_params["spatial_embed"]["bias"].astype(cfg.dtype)
    x = x + mix_params["spatial_pos_embed"].astype(cfg.dtype)

    # ---- stacked stage data (differentiable restructuring) ----
    def stack_pairs(prefix):
        per_pair = [mix_params[f"{prefix}_block_{i}"] for i in range(depth)]
        stacked = tree_map(lambda *ls: jnp.stack(ls), *per_pair)
        return tree_map(
            lambda l: l.reshape(n_stages, pps, *l.shape[1:]), stacked
        )

    tpe = mix_params["temporal_pos_embed"]
    tpos = jnp.zeros((depth,) + tpe.shape, tpe.dtype).at[0].set(tpe)
    tpos = tpos.reshape(n_stages, pps, *tpe.shape)
    dpr = jnp.asarray(cfg.drop_path_rates(), jnp.float32).reshape(
        n_stages, pps
    )
    stage_params = {
        "ste": stack_pairs("ste"),
        "tte": stack_pairs("tte"),
        "tpos": tpos,
        "dpr": dpr,
        "snorm": tree_map(
            lambda l: jnp.broadcast_to(l, (n_stages,) + l.shape),
            mix_params["spatial_norm"],
        ),
        "tnorm": tree_map(
            lambda l: jnp.broadcast_to(l, (n_stages,) + l.shape),
            mix_params["temporal_norm"],
        ),
    }
    stochastic = (not deterministic) and (
        cfg.drop_path_rate > 0.0 or cfg.attn_drop_rate > 0.0
    )
    if stochastic:
        assert rng is not None, "training-mode pipeline needs a dropout rng"
        stage_params["rng"] = jax.random.split(rng, n_stages)
    else:
        # no rng stream in the stage program: the (traced) rate override
        # must stay None or DropPath would demand one
        del stage_params["dpr"]

    # ---- the SPMD stage program: pps x (spatial pair-leg, temporal
    # pair-leg), mirroring MixSTE._spatial/_temporal + the pair-0
    # temporal-pos add ----
    def stage_fn(p, x, t):
        for j in range(pps):
            ste_p = tree_map(lambda l: l[j], p["ste"])
            tte_p = tree_map(lambda l: l[j], p["tte"])
            rate, rngs = None, None
            if stochastic:
                rate = p["dpr"][j]
                k = jax.random.fold_in(p["rng"], t)
                rngs = {"dropout": jax.random.fold_in(k, j)}
            b, l_, j_, c = x.shape
            h = x.reshape(b * l_, j_, c)
            h = block.apply(
                {"params": ste_p}, h, deterministic, rate, rngs=rngs
            )
            h = norm.apply({"params": p["snorm"]}, h)
            x = h.reshape(b, l_, j_, c)
            x = jnp.transpose(x, (0, 2, 1, 3))  # (B, J, L, C)
            x = x + p["tpos"][j].astype(cfg.dtype)
            h = x.reshape(b * j_, l_, c)
            if stochastic:
                rngs = {"dropout": jax.random.fold_in(rngs["dropout"], 1 << 20)}
            h = block.apply(
                {"params": tte_p}, h, deterministic, rate, rngs=rngs
            )
            h = norm.apply({"params": p["tnorm"]}, h)
            x = jnp.transpose(h.reshape(b, j_, l_, c), (0, 2, 1, 3))
        return x

    return pipeline_apply(
        stage_fn,
        stage_params,
        x,
        mesh,
        axis=pipe_axis,
        microbatches=microbatches,
        data_axis=data_axis,
        pass_tick=True,
    )


def _mixste_head(cfg, mix_params, feats):
    """Post-trunk head (``mix_ste.py:119-126,187``): LayerNorm(eps=1e-5)
    + muP readout division + Linear."""
    h = nn.LayerNorm(epsilon=1e-5, dtype=cfg.dtype).apply(
        {"params": mix_params["head_norm"]}, feats
    )
    if cfg.mup:
        h = h / cfg.readout_div
    h = jnp.dot(h, mix_params["head"]["kernel"].astype(cfg.dtype))
    return h + mix_params["head"]["bias"].astype(cfg.dtype)


def make_pipelined_apply(
    model,
    mesh: Mesh,
    pipe_axis: str = "pipe",
    data_axis: Optional[str] = None,
    microbatches: int = 4,
):
    """Drop-in replacement for ``model.apply`` with the rotations trunk
    GPipe-staged over ``pipe_axis``.

    model: MixSTE | ManifoldMixSTE | RMCLManifoldMixSTE. The returned
    ``apply_fn(params, x, deterministic=True, rngs=None)`` consumes the
    model's ordinary single-device parameter pytree (checkpoints are
    unchanged); the head / segments branch / FK decoder run outside the
    pipeline on the (optionally data-sharded) batch. A parity test pins
    this plumbing to ``model.apply`` (``tests/test_pipeline.py``).
    """
    from ..models.decoder import decode_poses
    from ..models.manifold import BonesMixSTE, ManifoldMixSTE
    from ..models.mix_ste import MixSTE
    from ..models.rmcl import MCLHeads, RMCLManifoldMixSTE

    def _mb(x):
        return pick_microbatches(
            x.shape[0], mesh.shape[data_axis] if data_axis else 1,
            microbatches,
        )

    def _rng(rngs):
        return None if rngs is None else rngs.get("dropout")

    if isinstance(model, MixSTE):
        cfg = model.cfg

        def apply_fn(params, x, deterministic: bool = True, rngs=None):
            p = params["params"]
            feats = _pipelined_trunk(
                cfg, p, x, deterministic, _rng(rngs), mesh, pipe_axis,
                data_axis, _mb(x), model.use_patch_embed,
            )
            return _mixste_head(cfg, p, feats) if model.apply_head else feats

        return apply_fn

    if isinstance(model, RMCLManifoldMixSTE):
        mcfg = model.cfg
        # reference quirk preserved (``rmcl.py: RMCLRotMixSTE``): the
        # rMCL rotations trunk never receives mup
        trunk_cfg = dataclasses.replace(mcfg.rot_trunk_config(), mup=False)
        heads = MCLHeads(
            n_hyp=mcfg.n_hyp,
            embed_dim=mcfg.embed_dim_rot,
            out_dim=mcfg.rot_rep_dim,
            num_joints=mcfg.num_joints,
            dtype=mcfg.dtype,
            mup=mcfg.mup,
            mup_base_width=mcfg.mup_base_width,
        )
        segments = BonesMixSTE(mcfg)

        def apply_fn(params, x, deterministic: bool = True, rngs=None):
            p = params["params"]
            rot = p["rotations_module"]
            feats = _pipelined_trunk(
                trunk_cfg, rot["trunk"], x, deterministic, _rng(rngs),
                mesh, pipe_axis, data_axis, _mb(x), True,
            )
            preds, logits = heads.apply({"params": rot["heads"]}, feats)
            scores = jax.nn.softmax(logits, axis=1)
            bones = segments.apply(
                {"params": p["segments_module"]}, x, deterministic,
                rngs=rngs,
            )
            lengths = bones[:, None, None, :, 0]  # (B, 1, 1, S)
            roots = jnp.zeros(preds.shape[:-2] + (3,), preds.dtype)
            poses = decode_poses(
                preds, lengths, roots, model.skeleton, mcfg.rot_rep_dim
            )
            return poses, scores

        return apply_fn

    if isinstance(model, ManifoldMixSTE):
        mcfg = model.cfg
        trunk_cfg = mcfg.rot_trunk_config()
        segments = BonesMixSTE(mcfg)

        def apply_fn(params, x, deterministic: bool = True, rngs=None):
            p = params["params"]
            rot = p["rotations_module"]
            feats = _pipelined_trunk(
                trunk_cfg, rot, x, deterministic, _rng(rngs), mesh,
                pipe_axis, data_axis, _mb(x), True,
            )
            rotations = _mixste_head(trunk_cfg, rot, feats)
            bones = segments.apply(
                {"params": p["segments_module"]}, x, deterministic,
                rngs=rngs,
            )
            lengths = jnp.swapaxes(bones, 1, 2)  # (B, 1, S)
            roots = jnp.zeros(rotations.shape[:-2] + (3,), rotations.dtype)
            return decode_poses(
                rotations, lengths, roots, model.skeleton, mcfg.rot_rep_dim
            )

        return apply_fn

    raise TypeError(f"unsupported model type for pipelining: {type(model)}")


def maybe_pipelined_apply(model, cfg):
    """Driver hook: ``model.apply``, or the GPipe-staged apply when the
    config asks for it (``parallel.pipe > 1``) — the one-flag story that
    matches the reference's ``nn.DataParallel`` switch
    (``main_h36m_lifting.py:747-751``) for pipeline parallelism."""
    pcfg = cfg.get("parallel") or {}
    pipe = int(pcfg.get("pipe", 1))
    if pipe <= 1:
        return model.apply
    from .mesh import make_mesh

    n_data = int(pcfg.get("data", 1))
    assert int(pcfg.get("model", 1)) == 1, (
        "parallel.pipe composes with data parallelism only "
        "(set parallel.model=1)"
    )
    mesh = make_mesh(data=n_data, pipe=pipe)
    return make_pipelined_apply(
        model,
        mesh,
        data_axis="data" if n_data > 1 else None,
        microbatches=int(pcfg.get("microbatches", 4)),
    )
