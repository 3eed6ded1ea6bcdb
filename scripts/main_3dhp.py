#!/usr/bin/env python
"""MPI-INF-3DHP train/eval entry point (reference: hpe/main_3dhp.py).

  python scripts/main_3dhp.py data=mpi_inf_3dhp \\
      run.checkpoint_model=/path/to/manipose_3dhp.pth run.train=false \\
      data.data_dir=/path/to/3dhp train.batch_size_test=30
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from manipose_tpu.utils.platform import apply_platform_env  # noqa: E402

apply_platform_env()

from manipose_tpu.config import load_config
from manipose_tpu.drivers.dhp3 import main

if __name__ == "__main__":
    overrides = list(sys.argv[1:])
    if not any(o.startswith("data=") or o.startswith("data.dataset=") for o in overrides):
        overrides.insert(0, "data=mpi_inf_3dhp")
    cfg = load_config("config", overrides=overrides)
    result = main(cfg)
    if result is not None:
        print(f"best_valid_mpjpe: {result}")
