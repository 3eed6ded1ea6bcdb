#!/usr/bin/env python
"""End-to-end learning validation on a synthetic-but-learnable task.

Generates plausible 3D pose sequences with the framework's own forward
kinematics (fixed bone lengths, smooth random joint rotations), projects
them to 2D with a pinhole camera, then trains the rMCL model to lift
2D -> 3D. A working system drives eval MPJPE far below the
predict-zero baseline; random inputs could never show that.

  python tools/synthetic_overfit.py [--epochs 30] [--small]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from manipose_tpu.utils.platform import (  # noqa: E402
    apply_platform_env,
    preflight_device_or_exit,
)

apply_platform_env()

import jax
import jax.numpy as jnp
import numpy as np

from manipose_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

from manipose_tpu.geometry import (
    forward_kinematics,
    h36m_skeleton_17,
    rot6d_to_matrix,
)
from manipose_tpu.data import PoseSequenceDataset, SequenceLoader
from manipose_tpu.eval import EvalConfig, evaluate
from manipose_tpu.models import ManifoldConfig, RMCLManifoldMixSTE
from manipose_tpu.train import (
    LossConfig,
    TrainState,
    make_optimizer,
    make_train_step,
)

# realistic-ish H36M-17 bone lengths (meters)
BONE_LENGTHS = np.asarray(
    [0.13, 0.45, 0.45, 0.13, 0.45, 0.45, 0.25, 0.25, 0.12, 0.12,
     0.15, 0.28, 0.25, 0.15, 0.28, 0.25], np.float32
)


def make_videos(n_videos, n_frames, skel, seed=0):
    """Smooth random rotation trajectories -> FK -> pinhole 2D."""
    rng = np.random.default_rng(seed)
    videos_3d, videos_2d = [], []
    for _ in range(n_videos):
        # smooth 6D rotation trajectories: random walk, low-pass filtered
        rep = rng.normal(size=(n_frames + 40, skel.num_joints, 6)).astype(
            np.float32
        )
        kernel = np.hamming(41)
        kernel /= kernel.sum()
        rep = np.apply_along_axis(
            lambda s: np.convolve(s, kernel, mode="valid"), 0, rep
        )[:n_frames]
        # moderate deviations around the T-pose: learnable structure
        rep = rep * 1.2 + np.asarray([1, 0, 0, 0, 1, 0], np.float32)
        rot = rot6d_to_matrix(jnp.asarray(rep))
        pose = forward_kinematics(
            rot, jnp.asarray(BONE_LENGTHS), jnp.zeros((n_frames, 3)), skel
        )
        pose = np.asarray(pose)
        # camera at z = 4m: root-relative 3D target, pinhole 2D input
        depth = pose[..., 2] + 4.0
        p2 = pose[..., :2] / depth[..., None]
        videos_3d.append(pose.astype(np.float32))
        videos_2d.append(p2.astype(np.float32))
    return videos_3d, videos_2d


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--seq-len", type=int, default=27)
    ap.add_argument("--small", action="store_true")
    args = ap.parse_args()
    # after parse_args: --help must not probe the device first
    preflight_device_or_exit(tool="synthetic_overfit")

    skel = h36m_skeleton_17()
    videos_3d, videos_2d = make_videos(8, 16 * args.seq_len, skel)
    train_ds = PoseSequenceDataset(
        videos_3d[:6], videos_2d[:6], seq_len=args.seq_len, random_start=True
    )
    eval_ds = PoseSequenceDataset(
        videos_3d[6:], videos_2d[6:], seq_len=args.seq_len
    )
    train_loader = SequenceLoader(train_ds, batch_size=16, shuffle=True, seed=0)
    eval_loader = SequenceLoader(eval_ds, batch_size=16)

    if args.small:
        cfg = ManifoldConfig(
            num_frame=args.seq_len, embed_dim_rot=64, depth_rot=3,
            num_heads_rot=4, embed_dim_seg=32, depth_seg=2, num_heads_seg=4,
            n_hyp=3, drop_path_rate=0.0,
        )
    else:
        cfg = ManifoldConfig(
            num_frame=args.seq_len, n_hyp=5, drop_path_rate=0.0,
            dtype=jnp.bfloat16,
        )
    model = RMCLManifoldMixSTE(cfg, skel)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, args.seq_len, 17, 2))
    )
    tx = make_optimizer(weight_decay=1e-6)
    state = TrainState.create(params, tx, jax.random.PRNGKey(1))
    step = make_train_step(
        model.apply, LossConfig(rmcl=True, vel_loss=2.0, smooth_reg=0.5),
        skel, tx, donate=False,
    )
    eval_cfg = EvalConfig(tta=True, rmcl=True, compute_oracle=True)

    def run_eval(p):
        return evaluate(model.apply, p, eval_loader, skel, eval_cfg)[2:5]

    zero_baseline = float(
        np.mean([np.linalg.norm(v, axis=-1).mean() for v in videos_3d[6:]])
    ) * 1000.0
    mpjpe0, oracle0, _ = run_eval(state.params)
    print(f"predict-zero baseline: {zero_baseline:.1f} mm", flush=True)
    print(f"untrained: mpjpe {mpjpe0:.1f} mm, oracle {oracle0:.1f} mm", flush=True)

    t0 = time.time()
    for epoch in range(args.epochs):
        train_loader.set_epoch(epoch)
        losses = []
        for batch in train_loader:
            state, metrics = step(
                state,
                jnp.asarray(batch.pose_2d),
                jnp.asarray(batch.pose_3d),
                4e-4,
            )
            losses.append(metrics["loss"])
        if (epoch + 1) % 10 == 0 or epoch == 0:
            mpjpe, oracle, _ = run_eval(state.params)
            print(
                f"epoch {epoch + 1}: loss {float(jnp.mean(jnp.asarray([float(l) for l in losses]))):.4f} "
                f"eval mpjpe {mpjpe:.1f} mm oracle {oracle:.1f} mm "
                f"({time.time() - t0:.0f}s)",
                flush=True,
            )
    mpjpe_final, oracle_final, psoracle = run_eval(state.params)
    print(
        f"FINAL: mpjpe {mpjpe_final:.1f} mm (untrained {mpjpe0:.1f}, "
        f"zero-baseline {zero_baseline:.1f}), oracle {oracle_final:.1f}, "
        f"ps-oracle {psoracle:.1f}",
        flush=True,
    )
    assert mpjpe_final < 0.5 * zero_baseline, (
        f"did not learn: {mpjpe_final} vs zero-baseline {zero_baseline}")
    print("LEARNING VERIFIED")


if __name__ == "__main__":
    main()
