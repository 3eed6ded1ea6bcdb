#!/bin/bash
# Table 1 reproduction: 5 seeds x {mlp, constrained, constrained_rmcl} on
# the hard-2 circle scenario, with the reference's per-arch train presets
# (reference quantitative_comparison_toy2d.sh: +train=mlp_hard2 etc.).
set -e
cd "$(dirname "$0")/.."
declare -A presets=(
  [mlp]=mlp_hard2
  [constrained]=constrained_hard2
  [constrained_rmcl]=rmcl_constrained_hard2
)
for seed in 42 43 44 45 46; do
  for arch in mlp constrained constrained_rmcl; do
    python scripts/main_toy.py data.scenario=hard-2 model.arch=$arch \
      train=${presets[$arch]} run.seed=$seed \
      run.experiment=toy2d_${arch}_seed${seed} "$@"
  done
done
