#!/usr/bin/env python
"""Eval/inference throughput on the TPU chip (companion to bench.py's
train number; the north-star covers train+eval throughput).

Measures the serving Predictor's end-to-end rate — windowing, fixed-shape
jitted forward with TTA, aggregation — in frames/sec on the flagship
243-frame rMCL model.
"""

import json
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

from manipose_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()


def main():
    preflight_device_or_exit(tool="bench_eval")
    from manipose_tpu.config import load_config
    from manipose_tpu.serving import Predictor

    quantize = "--int8" in sys.argv
    cfg = load_config("config")
    predictor = Predictor(cfg=cfg, batch_size=16, tta=True,
                          quantize=quantize)
    rng = np.random.default_rng(0)
    video = rng.normal(size=(16 * 243, 17, 2)).astype(np.float32)

    # warm (compile)
    predictor.predict_video(video)
    t0 = time.perf_counter()
    n_runs = 5
    for _ in range(n_runs):
        poses = predictor.predict_video(video)
    # predict_video converts to numpy per batch: already synchronized
    dt = (time.perf_counter() - t0) / n_runs
    frames_per_sec = video.shape[0] / dt
    print(
        json.dumps(
            {
                "metric": "rmcl_manipose_243f_eval_throughput"
                          + ("_int8" if quantize else ""),
                "value": round(frames_per_sec, 1),
                "unit": "frames/s",
                "tta": True,
            }
        )
    )


if __name__ == "__main__":
    main()
