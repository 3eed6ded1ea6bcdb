#!/usr/bin/env python
"""Batch-inference CLI: lift 2D keypoint videos to 3D poses.

The reference has no inference tool (research drivers only); this wraps
``manipose_tpu.serving.Predictor`` for production use:

  python tools/predict.py --input keypoints.npz --output poses.npz \\
      --checkpoint /path/to/manipose_h36m.pth [config overrides...]

Input: an .npz/.npy with one or more (N, J, 2) screen-normalized 2D
keypoint arrays (npz: one entry per video; npy: a single video).
Output: an .npz with a (N, J, 3) root-relative 3D pose array (meters)
per video, plus per-window hypotheses/scores when --hypotheses is set.
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from manipose_tpu.utils.compile_cache import enable_compilation_cache
from manipose_tpu.utils.platform import apply_platform_env

apply_platform_env()
# remote TPU compiles take minutes per graph; cache across invocations
# (the helper also guards against redirecting JAX's pinned cache object
# when another component already compiled under a different directory)
enable_compilation_cache()

import numpy as np


def load_videos(path: Path):
    if path.suffix == ".npy":
        return {"video": np.load(path)}
    data = np.load(path, allow_pickle=True)
    return {k: np.asarray(data[k]) for k in data.files}


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True, type=Path,
                    help=".npz/.npy of (N, J, 2) 2D keypoint videos")
    ap.add_argument("--output", required=True, type=Path)
    ap.add_argument("--checkpoint", default="",
                    help=".pth (reference format) or orbax directory")
    ap.add_argument("--tag", default="best_val",
                    help="orbax checkpoint tag (directory checkpoints)")
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--no-tta", action="store_true")
    ap.add_argument("--int8", action="store_true",
                    help="int8 weight+activation serving path")
    ap.add_argument("--window-stride", type=int, default=None,
                    help="quality mode: overlapping windows advancing "
                    "this many frames, center emission (<= ceil(L/2); "
                    "L/S x compute, measured ~8mm better, BASELINE.md)")
    ap.add_argument("--hypotheses", action="store_true",
                    help="also dump per-window hypotheses + scores")
    ap.add_argument("overrides", nargs="*",
                    help="config overrides (model.arch=..., data.seq_len=...)")
    args = ap.parse_args(argv)

    from manipose_tpu.config import load_config
    from manipose_tpu.serving import Predictor

    cfg = load_config("config", overrides=args.overrides)
    kw = dict(
        cfg=cfg,
        batch_size=args.batch_size,
        tta=not args.no_tta,
        quantize=args.int8,
    )
    predictor = Predictor.from_any(args.checkpoint, tag=args.tag, **kw)

    if args.hypotheses and not predictor.rmcl:
        print(
            "WARNING: --hypotheses requested but the model is not an "
            "rMCL multi-hypothesis architecture; no *_hypotheses/"
            "*_scores arrays will be written"
        )
    videos = load_videos(args.input)
    out = {}
    t0 = time.perf_counter()
    n_frames = 0
    for name, kps in videos.items():
        assert kps.ndim == 3 and kps.shape[-1] == 2, (
            f"{name}: expected (N, J, 2), got {kps.shape}"
        )
        n_frames += kps.shape[0]
        if args.hypotheses and predictor.rmcl:
            poses, hyps, scores = predictor.predict_video(
                kps, return_hypotheses=True,
                window_stride=args.window_stride,
            )
            out[f"{name}_hypotheses"] = hyps
            out[f"{name}_scores"] = scores
        else:
            poses = predictor.predict_video(
                kps, window_stride=args.window_stride
            )
        out[name] = poses
    dt = time.perf_counter() - t0
    args.output.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(args.output, **out)
    print(
        f"lifted {len(videos)} video(s) / {n_frames} frames in {dt:.2f}s "
        f"({n_frames / dt:.0f} frames/s) -> {args.output}"
    )


if __name__ == "__main__":
    main()
