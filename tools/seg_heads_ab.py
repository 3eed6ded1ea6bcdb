#!/usr/bin/env python
"""Trained-outcome A/B for the fast segments-branch option (VERDICT r3 #4).

The reference's segments branch uses 8 heads at embed_dim_seg=16/128
(head_dim 2/16), a structure that is latency-bound on the MXU: the r3
step-time study measured ~8 ms/step attributable purely to the head
split (2-head control 12.9 vs 21.1 ms; BASELINE.md "segments branch").
``model.nheads_seg=2`` is the documented-divergence fast option (same
embed dim, same block count — only the heads split changes, like
``model.layout``/``quant``). This tool shows the divergence does NOT
hurt trained outcomes: our full stack trained twice per seed on
identical data — nheads_seg=8 (reference structure) vs 2 — at the
head-to-head protocol scale (d=64, L=27, seg 16/2, K=3, 3 seeds),
comparing best-val MPJPE / MPSCE / MPSSE.

  python tools/seg_heads_ab.py [--seeds 0 1 2] [--epochs 10]

Throughput side of the A/B: ``tools/bench_sustained.py --nheads-seg 2``
on the chip (numbers in BASELINE.md).
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))

from manipose_tpu.utils.platform import apply_platform_env  # noqa: E402

apply_platform_env()

import numpy as np  # noqa: E402

import h36m_head_to_head as h2h  # noqa: E402  (shares protocol + CPU backend)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--seeds", type=int, nargs="+", default=[0, 1, 2])
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--heads-a", type=int, default=8,
                    help="reference structure (conf/config.yaml nheads_seg)")
    ap.add_argument("--heads-b", type=int, default=2,
                    help="the fast documented-divergence option")
    ap.add_argument(
        "--json", type=Path,
        default=REPO / "tools" / "artifacts" / "seg_heads_ab.json",
    )
    args = ap.parse_args()
    if args.heads_a == args.heads_b:
        # equal arms would collapse the dict to one key: both runs per
        # seed would append under the same name and the summary print
        # would IndexError on names[1]
        ap.error("--heads-a and --heads-b must differ (an A/B needs "
                 "two distinct arms)")

    # head-to-head protocol scale; only num_heads_seg differs per arm
    h2h.set_scale(frames=27, dims=64, depth=2, heads=4,
                  dims_seg=16, depth_seg=2, n_videos=8)

    arms = {f"seg{args.heads_a}": args.heads_a,
            f"seg{args.heads_b}": args.heads_b}
    results = {name: [] for name in arms}
    results["protocol"] = {
        "seeds": args.seeds, "epochs": args.epochs,
        # num_heads_seg is the A/B variable — per-arm values live in
        # "arms"; recording the pre-mutation default here would describe
        # a configuration neither arm used
        "model": {k: v for k, v in h2h.MODEL_KW.items()
                  if k != "num_heads_seg"},
        "arms": arms,
    }
    for seed in args.seeds:
        train_split, val_split = h2h.make_split(seed)
        for name, heads in arms.items():
            h2h.MODEL_KW["num_heads_seg"] = heads
            print(f"=== seed {seed}: {name} ===", flush=True)
            out = h2h.run_ours(seed, train_split, val_split, args.epochs)
            print(f"  -> {out}", flush=True)
            results[name].append(out)

    def stats(rows, key):
        v = np.asarray([r[key] for r in rows])
        return f"{v.mean():8.3f} ± {v.std():6.3f}"

    names = list(arms)
    print(f"\nmetric                {names[0]:>17s} {names[1]:>21s}")
    for key in ["best_val_mpjpe", "final_mpjpe", "mpsce", "mpsse"]:
        print(f"{key:20s} {stats(results[names[0]], key)}   "
              f"{stats(results[names[1]], key)}")
    args.json.parent.mkdir(parents=True, exist_ok=True)
    args.json.write_text(json.dumps(results, indent=1))
    print(f"\nwrote {args.json}")


if __name__ == "__main__":
    main()
