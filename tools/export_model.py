#!/usr/bin/env python
"""Export a trained model as a portable StableHLO serving artifact.

The reference has no deployment story (research drivers only); this
wraps ``Predictor.export_stablehlo`` (``manipose_tpu/serving.py``):
weights + windows-batch forward + TTA + hypothesis aggregation are
serialized into one self-contained StableHLO blob that any consumer of
``jax.export`` / StableHLO can run without flax, the model code, or the
checkpoint. The window-batch dimension is symbolic by default (one
artifact, any batch size).

  python tools/export_model.py --output manipose.stablehlo \\
      --checkpoint /path/to/manipose_h36m.pth [config overrides...]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import os

import jax

from manipose_tpu.utils.platform import apply_platform_env

apply_platform_env()
from manipose_tpu.utils.compile_cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--output", required=True, type=Path)
    ap.add_argument("--checkpoint", default="",
                    help=".pth (reference format) or orbax directory")
    ap.add_argument("--tag", default="best_val",
                    help="orbax checkpoint tag (directory checkpoints)")
    ap.add_argument("--batch-size", type=int, default=8,
                    help="batch dim of the exported signature (the "
                    "symbolic export accepts any size at call time)")
    ap.add_argument("--no-tta", action="store_true")
    ap.add_argument("--fixed-batch", action="store_true",
                    help="export a concrete batch dim instead of symbolic")
    ap.add_argument("--verify", action="store_true",
                    help="deserialize and check against the live forward")
    ap.add_argument("overrides", nargs="*",
                    help="config overrides (model.arch=..., data.seq_len=...)")
    args = ap.parse_args(argv)

    from manipose_tpu.config import load_config
    from manipose_tpu.serving import Predictor

    cfg = load_config("config", overrides=args.overrides)
    kw = dict(cfg=cfg, batch_size=args.batch_size, tta=not args.no_tta)
    predictor = Predictor.from_any(args.checkpoint, tag=args.tag, **kw)

    data = predictor.export_stablehlo(
        args.output, batch_symbolic=not args.fixed_batch
    )
    print(f"wrote {args.output} ({len(data) / 1e6:.2f} MB, "
          f"seq_len={predictor.seq_len}, "
          f"{'fixed' if args.fixed_batch else 'symbolic'} batch)")

    if args.verify:
        import jax.numpy as jnp

        f = Predictor.load_stablehlo(args.output)
        rng = np.random.default_rng(0)
        b = args.batch_size if args.fixed_batch else args.batch_size + 1
        x = rng.normal(
            size=(b, predictor.seq_len, predictor.skeleton.num_joints, 2)
        ).astype(np.float32)
        agg = np.asarray(f(x)[0])
        ref = np.asarray(
            predictor._forward(predictor.variables, jnp.asarray(x))[0]
        )
        err = float(np.abs(agg - ref).max())
        print(f"verify: max |artifact - live| = {err:.2e} at batch {b}")
        if not err < 1e-4:  # not assert: must survive python -O
            raise SystemExit(
                f"verification FAILED: artifact deviates by {err:.2e}"
            )


if __name__ == "__main__":
    main()
