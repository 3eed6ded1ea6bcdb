#!/usr/bin/env python
"""Streaming-accuracy study: MPJPE across (lookahead, stride) settings.

The streaming server (`Predictor.stream`, ``manipose_tpu/streaming.py``)
trades latency for accuracy: the bidirectional trunk predicts
center-window frames best, so a small ``lookahead`` (low latency, frames
predicted near the window's trailing edge) should cost accuracy vs the
center default. This tool measures that trade-off on a real dataset's
test split — per (lookahead, stride) cell, every test sequence is
streamed frame-by-frame and scored against GT (root-relative MPJPE, mm),
with the offline sliding-window path (`predict_video`) as the anchor
row. No reference counterpart (offline drivers only).

  python tools/streaming_eval.py --checkpoint runs/exp --tag best_mpjpe \\
      --dataset 3dhp --lookaheads 0 4 13 --strides 1 \\
      data.data_dir=... data.seq_len=27 [overrides...]
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from manipose_tpu.utils.platform import (  # noqa: E402
    apply_platform_env,
    preflight_device_or_exit,
)

apply_platform_env()
from manipose_tpu.utils.compile_cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import numpy as np  # noqa: E402


def mpjpe_mm(pred, gt):
    pred = pred - pred[:, :1]
    gt = gt - gt[:, :1]
    return float(np.linalg.norm(pred - gt, axis=-1).mean() * 1000.0)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--checkpoint", default="",
                    help=".pth (reference format) or orbax directory")
    ap.add_argument("--tag", default="best_val")
    ap.add_argument("--dataset", choices=["h36m", "3dhp"], default="3dhp")
    ap.add_argument("--lookaheads", nargs="+", type=int, default=None,
                    help="default: 0, L//8, L//2 (causal .. center)")
    ap.add_argument("--strides", nargs="+", type=int, default=[1])
    ap.add_argument("--limit-frames", type=int, default=2000,
                    help="cap frames per sequence (streaming is "
                    "one forward per stride frames)")
    ap.add_argument("--out", type=Path, default=None)
    ap.add_argument("overrides", nargs="*")
    args = ap.parse_args(argv)
    # after parse_args: --help/bad-args must print usage, not probe the
    # device (a tunnel outage would block the probe ~240s first)
    preflight_device_or_exit(tool="streaming_eval")

    from manipose_tpu.config import load_config
    from manipose_tpu.serving import Predictor

    base_overrides = list(args.overrides)
    if args.dataset == "3dhp":
        base_overrides = ["data=mpi_inf_3dhp"] + base_overrides
    cfg = load_config("config", overrides=base_overrides)

    # per-sequence (gt_3d meters, kps_2d normalized) pairs
    if args.dataset == "3dhp":
        from manipose_tpu.data.dhp3 import Dataset3DHP

        dataset = Dataset3DHP(cfg.data.data_dir, train=False)
        skeleton = dataset.skeleton
        sequences = list(zip(dataset.poses, dataset.poses_2d))
    else:
        from manipose_tpu.data import fetch
        from manipose_tpu.drivers.common import get_subjects_and_actions
        from manipose_tpu.drivers.h36m import fetch_and_prepare_data

        keypoints, dataset = fetch_and_prepare_data(cfg)
        (_, _, s_test), action_filter = get_subjects_and_actions(dataset, cfg)
        skeleton = dataset.skeleton
        poses, poses_2d, _, _ = fetch(
            s_test, dataset, keypoints, action_filter
        )
        sequences = list(zip(poses, poses_2d))
    sequences = [
        (p3[: args.limit_frames], p2[: args.limit_frames])
        for p3, p2 in sequences
    ]
    n_frames = sum(len(p3) for p3, _ in sequences)

    kw = dict(cfg=cfg, skeleton=skeleton, batch_size=1, tta=cfg.train.tta)
    predictor = Predictor.from_any(args.checkpoint, tag=args.tag, **kw)
    L = predictor.seq_len
    lookaheads = (
        args.lookaheads if args.lookaheads is not None
        else sorted({0, L // 8, L // 2})
    )

    rows = []

    def record(row):
        rows.append(row)
        print(json.dumps(row))

    # anchor: the offline sliding-window path
    errs = [
        mpjpe_mm(predictor.predict_video(p2), p3) * len(p3)
        for p3, p2 in sequences
    ]
    record({"mode": "offline", "lookahead": None, "stride": None,
            "mpjpe_mm": round(sum(errs) / n_frames, 3)})

    for lookahead in lookaheads:
        for stride in args.strides:
            if not 1 <= stride <= L - lookahead:
                print(f"SKIP lookahead={lookahead} stride={stride}: "
                      f"stride must be in [1, L - lookahead = "
                      f"{L - lookahead}]")
                continue
            errs = []
            for p3, p2 in sequences:
                sess = predictor.stream(stride=stride, lookahead=lookahead)
                pred = np.concatenate([sess.push(p2), sess.flush()], axis=0)
                errs.append(mpjpe_mm(pred, p3) * len(p3))
            record({
                "mode": "stream", "lookahead": lookahead, "stride": stride,
                "latency_frames": lookahead + stride - 1,
                "mpjpe_mm": round(sum(errs) / n_frames, 3),
            })

    if args.out:
        keys = ["mode", "lookahead", "stride", "latency_frames", "mpjpe_mm"]
        with open(args.out, "w") as f:
            f.write(",".join(keys) + "\n")
            for r in rows:
                f.write(",".join(str(r.get(k, "")) for k in keys) + "\n")
        print(f"wrote {args.out}")
    return rows


if __name__ == "__main__":
    main()
