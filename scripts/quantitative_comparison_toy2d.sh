#!/bin/bash
# Table 1 reproduction: 5 seeds x {mlp, constrained, constrained_rmcl} on
# the hard-2 circle scenario (reference quantitative_comparison_toy2d.sh).
set -e
cd "$(dirname "$0")/.."
for seed in 0 1 2 3 4; do
  for arch in mlp constrained constrained_rmcl; do
    python scripts/main_toy.py data.scenario=hard-2 model.arch=$arch \
      run.seed=$seed run.experiment=toy2d_${arch}_seed${seed} "$@"
  done
done
