#!/usr/bin/env python
"""Parameter counts for the three model families
(reference: hpe/useful_aux_scripts/count_n_params.py).

  python tools/count_n_params.py [model.channels=512 ...]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from manipose_tpu.utils.platform import apply_platform_env  # noqa: E402

apply_platform_env()

import jax

from manipose_tpu.config import load_config
from manipose_tpu.drivers.common import init_model_params, instantiate_model
from manipose_tpu.geometry import h36m_skeleton_17


def count(variables) -> int:
    return sum(p.size for p in jax.tree_util.tree_leaves(variables))


if __name__ == "__main__":
    skel = h36m_skeleton_17()
    for arch in ("mixste", "manifold", "rmcl_manifold"):
        cfg = load_config(
            "config", overrides=[f"model.arch={arch}", *sys.argv[1:]]
        )
        model, _ = instantiate_model(cfg, skel)
        params = init_model_params(model, cfg, skel.num_joints)
        print(f"{arch}: {count(params):,} params")
