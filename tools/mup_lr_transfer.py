#!/usr/bin/env python
"""muP learning-rate transfer demonstration.

The point of muP (the reason the reference ships ``mup.MuAdam`` + base
shapes, ``hpe/main_h36m_lifting.py:673-695``) is that the optimal
learning rate found on a SMALL model transfers to wider ones. This tool
demonstrates it on the MixSTE trunk: sweep the LR at several widths
under muP and report the per-width loss curves — the argmin LR should
be (near-)constant across widths, where standard parametrization
drifts.

  python tools/mup_lr_transfer.py --widths 32 64 128 --steps 20 \
      --out tools/artifacts/mup_lr_transfer.json

Runs on CPU in under a couple of minutes at the default sizes; the
JSON is the artifact recorded in BASELINE.md and asserted by
tests/test_mup.py.
"""

import argparse
import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from manipose_tpu.utils.platform import apply_platform_env  # noqa: E402

apply_platform_env()


def sweep_width(width, lrs, steps=20, base_width=32, depth=2, seq_len=9,
                mup=True, seed=0):
    """Train a small MixSTE at ``width`` for ``steps`` Adam steps at each
    LR; returns the final losses (one per LR)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from manipose_tpu.models import MixSTE, MixSTEConfig
    from manipose_tpu.train.mup import make_mup_optimizer
    from manipose_tpu.train.optim import make_optimizer

    cfg = MixSTEConfig(
        num_frame=seq_len, num_joints=17, embed_dim=width, depth=depth,
        num_heads=4, mup=mup, mup_base_width=base_width,
        drop_path_rate=0.0,
    )
    model = MixSTE(cfg)
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(16, seq_len, 17, 2)).astype(np.float32))
    # learnable nonlinear signal (not pure noise): the loss keeps
    # improving with training so the LR optimum is interior and sharp
    xn = np.asarray(x)
    y = jnp.asarray(np.stack(
        [np.tanh(xn[..., 0] * 2.0), xn[..., 0] * xn[..., 1],
         np.abs(xn[..., 1]) - 0.5], axis=-1
    ).astype(np.float32))
    params0 = model.init(jax.random.PRNGKey(seed), x)

    def loss_fn(p):
        return jnp.mean((model.apply(p, x) - y) ** 2)

    @jax.jit
    def run(params, lr):
        tx_local = (
            make_mup_optimizer(params, width=width, base_width=base_width,
                               weight_decay=0.0)
            if mup
            else make_optimizer(weight_decay=0.0)
        )
        opt_state = tx_local.init(params)
        opt_state.hyperparams["learning_rate"] = lr

        def body(carry, _):
            params, opt_state = carry
            grads = jax.grad(loss_fn)(params)
            updates, opt_state = tx_local.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), None

        (params, _), _ = jax.lax.scan(
            body, (params, opt_state), None, length=steps
        )
        return loss_fn(params)

    return [float(run(params0, jnp.asarray(lr, jnp.float32))) for lr in lrs]


def lr_transfer(widths=(32, 64, 128), lrs=None, steps=40, mup=True,
                seeds=(0, 1)):
    """Sweep LR x width; the transfer statistic is ``transfer_gap``:
    how far from optimal the LARGEST width is when run at the SMALLEST
    width's best LR (the practical muP claim — tune small, train big).
    Robust to flat near-tie bottoms that make raw argmin noisy."""
    import numpy as np

    lrs = list(lrs) if lrs is not None else list(
        np.geomspace(3e-4, 3e-1, 8)
    )
    curves = {}
    for w in widths:
        per_seed = np.array([
            sweep_width(w, lrs, steps=steps, mup=mup, seed=s)
            for s in seeds
        ])
        curves[int(w)] = np.mean(per_seed, axis=0).tolist()
    best_idx = {w: int(np.argmin(c)) for w, c in curves.items()}
    w_small, w_large = min(curves), max(curves)
    small_best_lr_idx = best_idx[w_small]
    large = np.asarray(curves[w_large])
    transfer_gap = float(
        large[small_best_lr_idx] / max(np.min(large), 1e-12) - 1.0
    )
    return {"lrs": lrs, "curves": curves, "best_idx": best_idx,
            "best_lr": {w: lrs[i] for w, i in best_idx.items()},
            "transfer_gap": transfer_gap, "mup": mup, "steps": steps}


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--widths", type=int, nargs="+", default=[32, 64, 128])
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--sp", action="store_true",
                    help="standard parametrization instead of muP "
                         "(shows the drift muP removes)")
    ap.add_argument("--out", type=Path, default=None)
    args = ap.parse_args()

    result = lr_transfer(
        widths=args.widths, steps=args.steps, mup=not args.sp,
        seeds=(args.seed, args.seed + 1),
    )
    for w in args.widths:
        losses = " ".join(f"{v:.4f}" for v in result["curves"][w])
        print(f"width {w:4d}: losses [{losses}]  "
              f"best lr = {result['best_lr'][w]:.2e}")
    gap = result["transfer_gap"]
    print(f"transfer gap (small-width best LR applied at largest width): "
          f"{gap * 100:.1f}% above that width's own optimum "
          f"({'TRANSFERS' if gap < 0.10 else 'DRIFTS'})")
    if args.out:
        args.out.parent.mkdir(parents=True, exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
