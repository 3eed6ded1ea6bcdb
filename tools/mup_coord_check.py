#!/usr/bin/env python
"""muP coordinate check across widths
(reference: hpe/useful_aux_scripts/mup_check.py).

Trains a few steps at several widths and reports per-layer activation
magnitudes; under muP they should be flat in width.

  python tools/mup_coord_check.py [--widths 32,64,128,256] [--steps 5]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from manipose_tpu.utils.platform import apply_platform_env  # noqa: E402

apply_platform_env()

import jax
import jax.numpy as jnp
import numpy as np
import optax

from manipose_tpu.models import MixSTE, MixSTEConfig
from manipose_tpu.train.mup import make_mup_optimizer

L, J = 27, 17


def run(width, base_width, steps, mup=True):
    cfg = MixSTEConfig(
        num_frame=L, num_joints=J, embed_dim=width, depth=2, num_heads=4,
        mup=mup, mup_base_width=base_width, drop_path_rate=0.0,
    )
    model, trunk = MixSTE(cfg), MixSTE(cfg, apply_head=False)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(8, L, J, 2)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(1), x)
    if mup:
        tx = make_mup_optimizer(params, width=width, base_width=base_width,
                                weight_decay=0.0)
    else:
        from manipose_tpu.train import make_optimizer

        tx = make_optimizer(weight_decay=0.0)
    opt_state = tx.init(params)
    opt_state.hyperparams["learning_rate"] = jnp.asarray(1e-2)

    def loss_fn(p):
        return jnp.mean((model.apply(p, x) - 1.0) ** 2)

    rows = []
    for step in range(steps):
        feats = trunk.apply(params, x)
        out = model.apply(params, x)
        rows.append(
            {
                "step": step,
                "width": width,
                "trunk_abs": float(jnp.mean(jnp.abs(feats))),
                "out_abs": float(jnp.mean(jnp.abs(out))),
            }
        )
        grads = jax.grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
    return rows


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--widths", default="32,64,128")
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--no-mup", action="store_true")
    args = ap.parse_args()
    widths = [int(w) for w in args.widths.split(",")]
    base = widths[0]
    print(f"{'width':>6} {'step':>4} {'trunk|a|':>10} {'out|a|':>10}")
    for w in widths:
        for row in run(w, base, args.steps, mup=not args.no_mup):
            print(
                f"{row['width']:>6} {row['step']:>4} "
                f"{row['trunk_abs']:>10.4f} {row['out_abs']:>10.4f}"
            )
