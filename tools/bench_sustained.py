#!/usr/bin/env python
"""Sustained training throughput INCLUDING the host input pipeline.

bench.py measures the pure device step; this tool runs real epochs
through PoseSequenceDataset -> SequenceLoader -> prefetch on synthetic
videos, so it catches any input-pipeline bottleneck (it should match or
beat the blocked per-step number thanks to dispatch overlap; r2 measured
41.5 seq/s sustained vs 37.2 blocked).

  python tools/bench_sustained.py [--epochs 2] [--batch 16] [--videos 40]
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

import numpy as np

import jax
import jax.numpy as jnp

from manipose_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--videos", type=int, default=40)
    ap.add_argument("--frames", type=int, default=700)
    ap.add_argument("--seq-len", type=int, default=243)
    ap.add_argument(
        "--steps-per-call", type=int, default=1,
        help="fuse K optimizer steps per dispatch (megastep A/B)",
    )
    ap.add_argument(
        "--nheads-seg", type=int, default=8,
        help="segments-branch heads: 8 = reference structure; 2 is the "
        "documented-divergence fast option (BASELINE.md r3 study: the "
        "8-head/d16 structure is latency-bound)",
    )
    args = ap.parse_args()
    # after parse_args: --help must not probe the device first
    preflight_device_or_exit(tool="bench_sustained")

    from manipose_tpu.data import PoseSequenceDataset, SequenceLoader
    from manipose_tpu.data.pipeline import prefetch
    from manipose_tpu.geometry import h36m_skeleton_17
    from manipose_tpu.models import ManifoldConfig, RMCLManifoldMixSTE
    from manipose_tpu.train import (
        LossConfig,
        TrainState,
        make_multi_train_step,
        make_optimizer,
        make_train_step,
    )

    skel = h36m_skeleton_17()
    rng = np.random.default_rng(0)
    vids3d = [
        rng.normal(scale=0.3, size=(args.frames, 17, 3)).astype(np.float32)
        for _ in range(args.videos)
    ]
    vids2d = [v[..., :2].copy() for v in vids3d]
    ds = PoseSequenceDataset(vids3d, vids2d, seq_len=args.seq_len,
                             random_start=True)
    loader = SequenceLoader(ds, batch_size=args.batch, shuffle=True, seed=0,
                            drop_last=True)

    cfg = ManifoldConfig(
        num_frame=args.seq_len, n_hyp=5, dtype=jnp.bfloat16,
        num_heads_seg=args.nheads_seg,
    )
    model = RMCLManifoldMixSTE(cfg, skel)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, args.seq_len, 17, 2))
    )
    tx = make_optimizer(weight_decay=1e-6)
    state = TrainState.create(params, tx, jax.random.PRNGKey(1))
    K = args.steps_per_call
    step = make_train_step(model.apply, LossConfig(rmcl=True), skel, tx,
                           donate=False)
    multi = (
        make_multi_train_step(
            model.apply, LossConfig(rmcl=True), skel, tx, K, donate=False
        )
        if K > 1
        else None
    )

    # warmup / compile
    # one batch without prefetch(): abandoning a prefetch generator
    # leaks its producer thread for the process lifetime
    batch0 = next(iter(loader))
    if multi is not None:
        xs = jnp.asarray(np.stack([batch0.pose_2d] * K))
        ys = jnp.asarray(np.stack([batch0.pose_3d] * K))
        state, m = multi(state, xs, ys, 4e-5)
        _ = float(m["loss"][-1])
    else:
        state, m = step(state, jnp.asarray(batch0.pose_2d),
                        jnp.asarray(batch0.pose_3d), 4e-5)
        _ = float(m["loss"])

    n_seq = 0
    pending = []
    t0 = time.perf_counter()
    for _ in range(args.epochs):
        for batch in prefetch(loader):
            if multi is not None:
                pending.append((batch.pose_2d, batch.pose_3d))
                if len(pending) == K:
                    xs = jnp.asarray(np.stack([p[0] for p in pending]))
                    ys = jnp.asarray(np.stack([p[1] for p in pending]))
                    state, m = multi(state, xs, ys, 4e-5)
                    n_seq += int(xs.shape[0] * xs.shape[1])
                    pending.clear()
            else:
                state, m = step(state, jnp.asarray(batch.pose_2d),
                                jnp.asarray(batch.pose_3d), 4e-5)
                n_seq += batch.pose_2d.shape[0]
    # float forces completion (block_until_ready is unreliable here)
    loss_last = m["loss"] if multi is None else m["loss"][-1]
    _ = float(loss_last)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(state.params)[0]))
    dt = time.perf_counter() - t0

    import json

    print(json.dumps({
        "metric": "rmcl_manipose_sustained_train_throughput",
        "value": round(n_seq / dt, 3),
        "unit": "seq/s",
        "n_sequences": n_seq,
        "seq_len": args.seq_len,
        "steps_per_call": K,
        "nheads_seg": args.nheads_seg,
    }))


if __name__ == "__main__":
    main()
