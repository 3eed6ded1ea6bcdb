#!/bin/bash
# Table 6 reproduction: 5 seeds x {mlp, constrained, constrained_rmcl} on
# the torus 2D->3D scenario with the reference's 3D_setup presets
# (reference quantitative_comparison_toy3d.sh: +data=3D_setup +train=3D_setup).
set -e
cd "$(dirname "$0")/.."
for seed in 42 43 44 45 46; do
  for arch in mlp constrained constrained_rmcl; do
    python scripts/main_toy.py data=3D_setup train=3D_setup \
      model.arch=$arch run.seed=$seed \
      run.experiment=toy3d_${arch}_seed${seed} "$@"
  done
done
