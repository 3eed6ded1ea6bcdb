#!/usr/bin/env python
"""Toy experiment entry point (reference: toy_experiment/main.py).

  python scripts/main_toy.py data.scenario=hard-2 model.arch=constrained_rmcl
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from manipose_tpu.utils.platform import apply_platform_env  # noqa: E402

apply_platform_env()

from manipose_tpu.config import load_config
from manipose_tpu.toy.main import main

if __name__ == "__main__":
    cfg = load_config("toy", overrides=sys.argv[1:])
    main(cfg)
