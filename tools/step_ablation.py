"""In-graph ablation profile of the flagship train step.

The jax.profiler trace (``train/profiling.py``) answers "what does one
compiled program spend time on"; this tool answers the coarser planning
question "what would the step cost WITHOUT subsystem X" by compiling and
timing ablated variants of the full train step on the target device:

    full          — RMCLManifoldMixSTE, the bench.py configuration
    no_seg        — segments branch replaced by constant bone lengths
    no_decode     — raw rotation slices in place of FK decode (+no seg)
    k1            — a single hypothesis head instead of n_hyp

Marginal costs are reported as deltas against ``full``. This is the
maintained form of the round-3 step-time exhaustion study (BASELINE.md):
the same harness that located the segments branch's 27.5 ms in-graph
marginal cost (7.4% of the step — invisible to standalone sub-module
timing, which double-counts dispatch overhead).

Usage:  python tools/step_ablation.py [--batch 16] [--steps 20]
(run on an otherwise-idle host; see bench.py's tunnel-starvation note)

No reference counterpart (the reference has no profiling tooling at
all, SURVEY §5) — this is TPU-framework observability surface.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--seq-len", type=int, default=243)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument(
        "--ablations",
        default="full,no_seg,no_decode,k1",
        help="comma list from {full,no_seg,no_decode,k1,depth4,"
        "no_droppath,fwd,remat} — depth4 halves the trunk depth (per-block-pair "
        "in-graph marginal = (full - depth4)/4), no_droppath zeroes "
        "stochastic depth (its train-mode mask/where cost), fwd times the "
        "train-mode forward+loss alone (no grad, no optimizer)",
    )
    p.add_argument(
        "--pack-group",
        type=int,
        default=None,
        help="override ops.attention.SPATIAL_PACK_MAX_GROUP for every "
        "ablation (sweep the spatial block-diagonal packing width; "
        "measured optimum is 8 — the under-128-lane heuristic LOST the "
        "r3 on-chip sweep, see ops/attention.py)",
    )
    args = p.parse_args(argv)

    import jax

    from manipose_tpu.utils.platform import apply_platform_env

    platform = apply_platform_env()
    import jax.numpy as jnp
    from flax import linen as nn

    from manipose_tpu.utils.compile_cache import enable_compilation_cache

    # platform-aware default: TPU -> tunnel cache, CPU -> the per-host
    # fingerprinted dir (shared with the test suite)
    enable_compilation_cache()

    from manipose_tpu.geometry import h36m_skeleton_17
    from manipose_tpu.models import ManifoldConfig, RMCLManifoldMixSTE
    from manipose_tpu.models.decoder import decode_poses
    from manipose_tpu.models.manifold import BonesMixSTE
    from manipose_tpu.models.rmcl import RMCLRotMixSTE
    from manipose_tpu.train import (
        LossConfig,
        TrainState,
        make_optimizer,
        make_train_step,
    )

    if args.pack_group is not None:
        from manipose_tpu.ops import attention as _attn

        _attn.SPATIAL_PACK_MAX_GROUP = args.pack_group

    skel = h36m_skeleton_17()
    cfg = ManifoldConfig(
        num_frame=args.seq_len, n_hyp=5, dtype=jnp.bfloat16
    )

    class RMCLNoSeg(nn.Module):
        """Segments branch ablated to unit bone lengths."""

        cfg: ManifoldConfig
        skeleton: object

        def setup(self):
            self.rotations_module = RMCLRotMixSTE(
                self.cfg, name="rotations_module"
            )
            # parameters kept so the optimizer side stays comparable
            self.segments_module = BonesMixSTE(
                self.cfg, name="segments_module"
            )

        def __call__(self, x, deterministic: bool = True):
            rotations, scores = self.rotations_module(x, deterministic)
            lengths = jnp.ones(
                (x.shape[0], 1, 1, self.cfg.num_bones), rotations.dtype
            )
            roots = jnp.zeros(rotations.shape[:-2] + (3,), rotations.dtype)
            poses = decode_poses(
                rotations, lengths, roots, self.skeleton,
                self.cfg.rot_rep_dim,
            )
            return poses, scores

    class RMCLNoDecode(nn.Module):
        """FK decode ablated: first 3 rotation channels stand in for
        poses (also drops the seg branch — decode is its only consumer)."""

        cfg: ManifoldConfig
        skeleton: object

        def setup(self):
            self.rotations_module = RMCLRotMixSTE(
                self.cfg, name="rotations_module"
            )

        def __call__(self, x, deterministic: bool = True):
            rots, scores = self.rotations_module(x, deterministic)
            return rots[..., :3], scores

    def build(name):
        if name == "full":
            return RMCLManifoldMixSTE(cfg, skel)
        if name == "no_seg":
            return RMCLNoSeg(cfg, skel)
        if name == "no_decode":
            return RMCLNoDecode(cfg, skel)
        if name == "k1":
            return RMCLManifoldMixSTE(
                dataclasses.replace(cfg, n_hyp=1), skel
            )
        if name == "depth4":
            return RMCLManifoldMixSTE(
                dataclasses.replace(cfg, depth_rot=4), skel
            )
        if name == "no_droppath":
            return RMCLManifoldMixSTE(
                dataclasses.replace(cfg, drop_path_rate=0.0), skel
            )
        if name == "remat":
            return RMCLManifoldMixSTE(
                dataclasses.replace(cfg, remat=True), skel
            )
        raise ValueError(name)

    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.normal(size=(args.batch, args.seq_len, 17, 2)).astype(np.float32)
    )
    y = jnp.asarray(
        0.1
        * rng.normal(size=(args.batch, args.seq_len, 17, 3)).astype(
            np.float32
        )
    )
    tx = make_optimizer(weight_decay=1e-6)

    def measure_fwd(model):
        """Train-mode forward + loss only (no grad, no update): the
        fwd side of the fwd:bwd split. Chained through a scalar carry so
        the steps cannot be reordered/elided."""
        from manipose_tpu.train.losses import compute_loss

        from manipose_tpu.utils.platform import tpu_compiler_options

        params = model.init(jax.random.PRNGKey(0), x[:1])
        loss_rng = jax.random.PRNGKey(1)

        # same compiler options as every make_train_step-built ablation:
        # the fwd:bwd split must not absorb the scoped-VMEM budget delta
        @partial(jax.jit, compiler_options=tpu_compiler_options())
        def fwd(carry, rng):
            pred = model.apply(
                params, x + carry * 0.0, deterministic=False,
                rngs={"dropout": rng},
            )
            total, _ = compute_loss(pred, y, LossConfig(rmcl=True), skel)
            return total

        carry = jnp.zeros(())
        for _ in range(3):
            carry = fwd(carry, loss_rng)
            _ = float(carry)
        t0 = time.perf_counter()
        for _ in range(args.steps):
            carry = fwd(carry, loss_rng)
        _ = float(carry)
        return (time.perf_counter() - t0) / args.steps

    def measure(model):
        params = model.init(jax.random.PRNGKey(0), x[:1])
        state = TrainState.create(params, tx, jax.random.PRNGKey(1))
        step = make_train_step(
            model.apply, LossConfig(rmcl=True), skel, tx, donate=False
        )
        for _ in range(3):
            state, metrics = step(state, x, y, 4e-5)
            _ = float(metrics["loss"])  # forced-completion warmup drain
        _ = float(jnp.sum(jax.tree_util.tree_leaves(state.params)[0]))
        t0 = time.perf_counter()
        for _ in range(args.steps):
            state, metrics = step(state, x, y, 4e-5)
        _ = float(metrics["loss"])
        _ = float(jnp.sum(jax.tree_util.tree_leaves(state.params)[0]))
        return (time.perf_counter() - t0) / args.steps

    results = {}
    names = [n.strip() for n in args.ablations.split(",") if n.strip()]
    for name in names:
        if name == "fwd":
            dt = measure_fwd(build("full"))
        else:
            dt = measure(build(name))
        results[name] = {
            "ms_per_step": round(dt * 1e3, 1),
            "seq_per_sec": round(args.batch / dt, 2),
        }
        print(f"{name}: {dt*1e3:.1f} ms/step  {args.batch/dt:.2f} seq/s",
              flush=True)

    if "full" in results:
        base = results["full"]["ms_per_step"]
        for name, r in results.items():
            if name != "full":
                r["marginal_ms"] = round(base - r["ms_per_step"], 1)
    print(json.dumps(results))
    return results


if __name__ == "__main__":
    main()
