#!/usr/bin/env python
"""Hyper-parameter search over driver objectives.

The reference wires hydra-optuna-sweeper and returns ``best_valid_mpjpe``
from ``main`` as the objective (``hpe/main_h36m_lifting.py:1264-1266``).
optuna isn't available in this environment, so this implements the same
capability with random search over override spaces.

  python tools/hp_search.py --driver toy --trials 8 \\
      --space train.lr=loguniform:1e-4,1e-2 model.hidden_features=choice:16,32,64 \\
      -- data.scenario=hard-2 model.arch=constrained_rmcl train.epochs=30
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

from manipose_tpu.config import load_config


def sample(space_spec: str, rng: np.random.Generator):
    kind, args = space_spec.split(":", 1)
    if kind == "choice":
        return rng.choice(args.split(","))
    lo, hi = (float(x) for x in args.split(","))
    if kind == "uniform":
        return float(rng.uniform(lo, hi))
    if kind == "loguniform":
        return float(np.exp(rng.uniform(np.log(lo), np.log(hi))))
    if kind == "int":
        return int(rng.integers(int(lo), int(hi) + 1))
    raise ValueError(f"unknown space kind: {kind}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--driver", choices=["h36m", "3dhp", "toy"], default="toy")
    ap.add_argument("--trials", type=int, default=8)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--space", nargs="+", required=True)
    ap.add_argument("rest", nargs="*")
    args = ap.parse_args()

    if args.driver == "toy":
        from manipose_tpu.toy.main import main as run

        base_cfg = "toy"
    elif args.driver == "h36m":
        from manipose_tpu.drivers.h36m import main as run

        base_cfg = "config"
    else:
        from manipose_tpu.drivers.dhp3 import main as run

        base_cfg = "config"

    space = dict(s.split("=", 1) for s in args.space)
    rng = np.random.default_rng(args.seed)
    results = []
    for trial in range(args.trials):
        overrides = list(args.rest)
        sampled = {k: sample(v, rng) for k, v in space.items()}
        overrides += [f"{k}={v}" for k, v in sampled.items()]
        overrides += [f"run.experiment=hp_trial_{trial}"]
        cfg = load_config(base_cfg, overrides=overrides)
        objective = run(cfg)
        results.append((objective, sampled))
        print(f"[trial {trial}] objective={objective} params={sampled}",
              flush=True)

    results = [r for r in results if r[0] is not None]
    results.sort(key=lambda r: r[0])
    print("\nbest:", results[0] if results else "n/a")


if __name__ == "__main__":
    main()
