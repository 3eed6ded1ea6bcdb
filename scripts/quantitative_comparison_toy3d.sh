#!/bin/bash
# Table 6 reproduction: 5 seeds x {mlp, constrained, constrained_rmcl} on
# the torus 2D->3D scenario (reference quantitative_comparison_toy3d.sh).
set -e
cd "$(dirname "$0")/.."
for seed in 0 1 2 3 4; do
  for arch in mlp constrained constrained_rmcl; do
    python scripts/main_toy.py data.scenario=torus-2Dto3D model.arch=$arch \
      run.seed=$seed run.experiment=toy3d_${arch}_seed${seed} "$@"
  done
done
