#!/usr/bin/env python
"""Emit the paper's toy figures from freshly trained toy models.

  python scripts/paper_figures.py [--out-dir figures] [--epochs 50]
      [--seed 0] [--skip-fig4] [--skip-fig8]

Reproduces Figure 4 (setting / oracles / predictions panels,
``toy_experiment/plotting_script.py``) and Figure 8 (torus mixture,
``toy_experiment/tor-plot.py``).
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from manipose_tpu.utils.platform import apply_platform_env  # noqa: E402

apply_platform_env()


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out-dir", type=Path, default=Path("figures"))
    p.add_argument("--epochs", type=int, default=50)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--skip-fig4", action="store_true")
    p.add_argument("--skip-fig8", action="store_true")
    args = p.parse_args()

    from manipose_tpu.toy.paper_figures import figure4, figure8

    args.out_dir.mkdir(parents=True, exist_ok=True)
    if not args.skip_fig4:
        out = figure4(args.out_dir / "figure4.png", seed=args.seed,
                      epochs=args.epochs)
        print("wrote", out)
    if not args.skip_fig8:
        out = figure8(args.out_dir / "figure8.png")
        print("wrote", out)


if __name__ == "__main__":
    main()
