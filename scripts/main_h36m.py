#!/usr/bin/env python
"""Human3.6M train/eval entry point.

Usage mirrors the reference README commands:
  python scripts/main_h36m.py run.train=false \\
      run.checkpoint_model=/path/to/manipose_h36m.pth \\
      data.data_dir=/path/to/data train.batch_size_test=10
Group swaps work like hydra groups: ``train=mix_ste`` ``model=small``.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from manipose_tpu.utils.platform import apply_platform_env  # noqa: E402

apply_platform_env()

from manipose_tpu.config import load_config
from manipose_tpu.drivers.h36m import main

if __name__ == "__main__":
    cfg = load_config("config", overrides=sys.argv[1:])
    result = main(cfg)
    if result is not None:
        print(f"best_valid_mpjpe: {result}")
