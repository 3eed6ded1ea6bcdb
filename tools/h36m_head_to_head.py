#!/usr/bin/env python
"""Driver-level trained-model parity on the FLAGSHIP task: the
reference's own H36M training loop (torch, imported read-only) vs this
framework, on identical synthetic pose data.

Real H36M data is unobtainable here (zero egress), so both sides train
on the same FK-generated pose videos (``tools/synthetic_overfit.py``:
smooth random rotations -> constant-bone-length FK -> pinhole 2D) —
a learnable 2D->3D lifting task with the exact data geometry of the real
one. Each side uses its OWN full training stack end to end: the
reference's ``main_h36m_lifting.train`` + ``PoseSequenceGenerator`` +
``eval_utils.evaluate`` (``/root/reference/hpe``), vs our
``train.loop.train`` + ``PoseSequenceDataset`` + ``eval.engine``.
Outcomes (best validation MPJPE, oracle MPJPE, MPSCE/MPSSE of the best
model) are compared across seeds. Complements the toy head-to-head
(``tools/toy_head_to_head.py``) at the main task's driver level.

Protocol (shared): rMCL ManifoldMixSTE d=64/depth=2, seg 16/2, K=3,
L=27 frames, Adam lr 1e-3 wd 1e-6, plateau scheduler, WTA+BCE+velocity+
smoothness loss (the flagship composite), no flip aug / no occlusions
(their RNG streams cannot be bit-matched across frameworks and are
parity-tested separately), TTA off.

  python tools/h36m_head_to_head.py [--seeds 0 1 2] [--epochs 10]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import types
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))
sys.path.insert(0, str(REPO / "tools"))

from manipose_tpu.utils.platform import apply_platform_env  # noqa: E402

apply_platform_env()
os.environ.setdefault("MPLBACKEND", "Agg")

import numpy as np

# conftest import side effect: CPU backend (the reference is CPU torch;
# identical backends keep the comparison fair) + reference loaders
import conftest  # noqa: E402
from conftest import install_driver_stubs, load_ref_module  # noqa: E402

L, J, K = 27, 17, 3
N_VIDEOS = 8
MODEL_KW = dict(
    embed_dim_rot=64, depth_rot=2, num_heads_rot=4,
    embed_dim_seg=16, depth_seg=2, num_heads_seg=4,
    # align explicitly: the reference constructor defaults to 0.2 while
    # both configs ship 0.1 (hpe/conf/config.yaml:51)
    drop_path_rate=0.1,
)


def set_scale(frames: int, dims: int, depth: int, heads: int | None,
              dims_seg: int, depth_seg: int, n_videos: int) -> None:
    """Scale the shared protocol (both sides read these globals).

    The default (d=64/depth=2/L=27) finishes in minutes; ``--dims 128
    --depth 4 --frames 81`` is the quarter-width/half-depth/third-length
    point between it and the flagship (d=512/depth=8/L=243) — the
    reference side is eager torch CPU, so full flagship scale (55 s/step,
    BASELINE.md) is out of reach for a multi-seed trained comparison.
    """
    global L, N_VIDEOS, MODEL_KW
    L = frames
    N_VIDEOS = n_videos
    MODEL_KW = dict(
        embed_dim_rot=dims,
        depth_rot=depth,
        num_heads_rot=heads if heads else max(4, dims // 16),
        embed_dim_seg=dims_seg,
        depth_seg=depth_seg,
        num_heads_seg=4,
        drop_path_rate=0.1,
    )


def make_split(seed: int):
    from synthetic_overfit import make_videos

    from manipose_tpu.geometry import h36m_skeleton_17

    skel = h36m_skeleton_17()
    videos_3d, videos_2d = make_videos(
        n_videos=N_VIDEOS, n_frames=8 * L, skel=skel, seed=1000 + seed
    )
    n_train = max(1, (3 * N_VIDEOS) // 4)
    return (
        (videos_3d[:n_train], videos_2d[:n_train]),
        (videos_3d[n_train:], videos_2d[n_train:]),
    )


# ---------------------------------------------------------------------------
# reference side
# ---------------------------------------------------------------------------
def run_reference(seed: int, train_split, val_split, epochs: int,
                  protocol: str = "h36m"):
    """protocol="h36m": the reference's ``main_h36m_lifting.train`` +
    its MPJPE test block. protocol="3dhp": the reference's OWN 3DHP
    driver copy (``main_3dhp.train``) and its PCK@150/AUC test block
    (``main_3dhp.py:800-905``: pck/auc on the oracle preds, agg_pck/
    agg_auc on the aggregated ones, consistency on the oracle preds)."""
    import torch
    from torch.utils.data import DataLoader

    ref_rmcl_mod = install_driver_stubs()
    ref_main = load_ref_module(
        "main_3dhp" if protocol == "3dhp" else "main_h36m_lifting"
    )
    ref_generators = load_ref_module("mh_so3_hpe.data.generators")
    ref_reg = load_ref_module("mh_so3_hpe.metrics.regularizations")

    from test_geometry import _reference_h36m_17

    ref_skel = _reference_h36m_17()
    torch.manual_seed(seed)
    model = ref_rmcl_mod.RMCLManifoldMixSTE(
        skeleton=ref_skel, num_frame=L, num_joints=J, num_bones=16,
        n_hyp=K, **MODEL_KW,
    )

    def loader(split, train):
        gen = ref_generators.PoseSequenceGenerator(
            [p.copy() for p in split[0]],
            [p.copy() for p in split[1]],
            None,
            seq_len=L,
            random_start=train,
            drop_last=False,
            miss_type="no_miss",
        )
        g = torch.Generator()
        g.manual_seed(seed)
        return DataLoader(gen, batch_size=8, shuffle=train, generator=g)

    cfg = types.SimpleNamespace(
        run=types.SimpleNamespace(checkpoint_params=""),
        model=types.SimpleNamespace(mup=False),
        multi_hyp=types.SimpleNamespace(n_hyp=K, agg_strategy="average"),
        train=types.SimpleNamespace(
            epochs=epochs, lr=1e-3, lr_scheduler="plateau", lr_min=0.0,
            n_annealing=1, lr_patience=3, lr_threshold=0.1,
            valid_epoch_interval=1, mpjpe_epoch_interval=2, tta=False,
            sq_loss=False, w_loss=True, vel_loss=2.0, smooth_reg=0.5,
            rmcl_score_reg=0.1, rigid_seg_reg=0.0,
            lat_sym_regularization=0.0,
        ),
    )

    with tempfile.TemporaryDirectory() as tmp:
        best_mpjpe, model = ref_main.train(
            model, cfg, "cpu", loader(train_split, True),
            loader(val_split, False), ref_skel, foldername=tmp,
            mlflow_on=False,
        )
    model.eval()
    ref_eval = load_ref_module("eval_utils")
    preds, targets, perf, oracle, _, oracle_preds = ref_eval.evaluate(
        model=model, loader=loader(val_split, False), device="cpu",
        config=cfg, skeleton=ref_skel, compute_oracle=True,
    )
    # evaluate() returns (B, L, J, 3); the drivers' metric blocks work in
    # (B, 3, J, L) (``main_h36m_lifting.py:936-960``, ``main_3dhp.py:824-848``)
    cons_src = oracle_preds if protocol == "3dhp" else preds
    gen = torch.cat(cons_src, dim=0).permute(0, 3, 2, 1)  # mm
    _, _, j, _ = gen.shape
    mpsce = float(
        ref_reg.segments_time_consistency(
            gen.permute(1, 2, 0, 3).reshape(1, 3, j, -1),
            ref_skel, mode="std",
        )
    )
    mpsse = float(
        ref_reg.sagittal_symmetry(gen, ref_skel, mode="average",
                                  squared=False)
    )
    out = {
        "best_val_mpjpe": float(best_mpjpe),
        "final_mpjpe": float(perf),
        "mpsce": mpsce,
        "mpsse": mpsse,
    }
    if protocol == "3dhp":
        # the 3DHP test block (``main_3dhp.py:879-905``): PCK@150/AUC,
        # oracle preds for pck/auc, aggregated for agg_pck/agg_auc
        ref_pck = load_ref_module("mh_so3_hpe.metrics.pck")
        gt = (torch.cat(targets, dim=0) * 1000).reshape(-1, j, 3)
        orc = torch.cat(oracle_preds, dim=0).reshape(-1, j, 3)
        agg = torch.cat(preds, dim=0).reshape(-1, j, 3)
        out["pck"] = float(ref_pck.keypoint_3d_pck(
            pred=orc, gt=gt, mask=None, threshold=150))
        out["auc"] = float(ref_pck.keypoint_3d_auc(
            pred=orc, gt=gt, mask=None))
        out["agg_pck"] = float(ref_pck.keypoint_3d_pck(
            pred=agg, gt=gt, mask=None, threshold=150))
        out["agg_auc"] = float(ref_pck.keypoint_3d_auc(
            pred=agg, gt=gt, mask=None))
    return out


# ---------------------------------------------------------------------------
# our side
# ---------------------------------------------------------------------------
def run_ours(seed: int, train_split, val_split, epochs: int,
             protocol: str = "h36m"):
    from manipose_tpu.config import load_config
    from manipose_tpu.data import PoseSequenceDataset, SequenceLoader
    from manipose_tpu.drivers.common import init_model_params, instantiate_model
    from manipose_tpu.eval import EvalConfig, evaluate
    from manipose_tpu.geometry import h36m_skeleton_17
    from manipose_tpu.metrics import (
        sagittal_symmetry,
        segments_time_consistency,
    )
    from manipose_tpu.train.loop import train as train_loop

    skel = h36m_skeleton_17()
    cfg = load_config(
        "config",
        overrides=[
            f"run.seed={seed}",
            f"data.seq_len={L}",
            f"model.channels={MODEL_KW['embed_dim_rot']}",
            f"model.layers={MODEL_KW['depth_rot']}",
            f"model.nheads={MODEL_KW['num_heads_rot']}",
            f"model.channels_seg={MODEL_KW['embed_dim_seg']}",
            f"model.layers_seg={MODEL_KW['depth_seg']}",
            f"model.nheads_seg={MODEL_KW['num_heads_seg']}",
            "model.drop_path_rate=0.1",
            f"multi_hyp.n_hyp={K}",
            f"train.epochs={epochs}", "train.lr=1e-3",
            "train.lr_scheduler=plateau", "train.lr_patience=3",
            "train.lr_threshold=0.1", "train.valid_epoch_interval=1",
            "train.mpjpe_epoch_interval=2", "train.tta=false",
            "train.batch_size=8", "train.batch_size_test=8",
            "train.flip_aug=false",
            "model.init=torch",
        ],
    )
    model, rmcl = instantiate_model(cfg, skel)
    params = init_model_params(model, cfg, skel.num_joints)

    def loader(split, train):
        ds = PoseSequenceDataset(
            [p.copy() for p in split[0]],
            [p.copy() for p in split[1]],
            None,
            seq_len=L,
            random_start=train,
            miss_type="no_miss",
            skeleton=skel,
            flip_probability=0.0,
        )
        return SequenceLoader(ds, batch_size=8, shuffle=train, seed=seed)

    with tempfile.TemporaryDirectory() as tmp:
        result = train_loop(
            model.apply, params, cfg, skel, loader(train_split, True),
            loader(val_split, False), tmp, rmcl=rmcl,
            save_checkpoints=False,
        )
    preds, targets, perf, oracle, _, oracle_preds = evaluate(
        model.apply, result.best_params, loader(val_split, False), skel,
        EvalConfig(tta=False, rmcl=True, compute_oracle=True),
    )
    # consistency source mirrors the reference protocol: aggregated preds
    # for H36M, oracle preds for 3DHP (``main_3dhp.py:824-848``)
    gen = np.concatenate(
        oracle_preds if protocol == "3dhp" else preds, axis=0
    )  # mm
    n, l, j, _ = gen.shape
    mpsce = float(
        segments_time_consistency(
            gen.reshape(1, n * l, j, 3), skel, mode="std"
        )
    )
    mpsse = float(
        sagittal_symmetry(gen, skel, mode="average", squared=False)
    )
    out = {
        "best_val_mpjpe": float(result.best_mpjpe),
        "final_mpjpe": float(perf),
        "mpsce": mpsce,
        "mpsse": mpsse,
    }
    if protocol == "3dhp":
        from manipose_tpu.metrics.pck import (
            keypoint_3d_auc,
            keypoint_3d_pck,
        )

        gt = (np.concatenate(targets, axis=0) * 1000.0).reshape(-1, j, 3)
        orc = gen.reshape(-1, j, 3)
        agg = np.concatenate(preds, axis=0).reshape(-1, j, 3)
        out["pck"] = float(keypoint_3d_pck(orc, gt, threshold=150.0))
        out["auc"] = float(keypoint_3d_auc(orc, gt))
        out["agg_pck"] = float(keypoint_3d_pck(agg, gt, threshold=150.0))
        out["agg_auc"] = float(keypoint_3d_auc(agg, gt))
    return out


def main(protocol: str = "h36m", doc: str | None = None):
    ap = argparse.ArgumentParser(description=doc or __doc__)
    ap.add_argument("--seeds", type=int, nargs="+", default=[0, 1, 2])
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument(
        "--side", choices=["both", "reference", "ours"], default="both",
        help="run only one side's cells (the other side's rows are "
        "preserved if --json already exists) — lets an interrupted "
        "multi-hour table be completed cell by cell",
    )
    ap.add_argument("--frames", type=int, default=27,
                    help="window length L (flagship: 243)")
    ap.add_argument("--dims", type=int, default=64,
                    help="rotations-trunk width (flagship: 512)")
    ap.add_argument("--depth", type=int, default=2,
                    help="rotations-trunk depth (flagship: 8)")
    ap.add_argument("--heads", type=int, default=None,
                    help="rotations-trunk heads (default: dims//16)")
    ap.add_argument("--dims-seg", type=int, default=16)
    ap.add_argument("--depth-seg", type=int, default=2)
    ap.add_argument("--n-videos", type=int, default=8)
    ap.add_argument(
        "--json",
        type=Path,
        default=REPO / "tools" / "artifacts" / (
            f"{protocol}_head_to_head.json" if protocol != "h36m"
            else "h36m_head_to_head.json"
        ),
    )
    args = ap.parse_args()
    set_scale(args.frames, args.dims, args.depth, args.heads,
              args.dims_seg, args.depth_seg, args.n_videos)

    # Resume/merge: preserve cells already recorded in --json (matching
    # by seed), so a run that died mid-table (round-4 failure mode: the
    # wall-clock budget expired during the final cell) can be completed
    # with --side/--seeds targeting just the missing cells.
    results = {"reference": [], "ours": [], "protocol": {
        "name": protocol,
        "seeds": args.seeds, "epochs": args.epochs, "seq_len": L,
        "n_hyp": K, "model": MODEL_KW, "n_videos": N_VIDEOS,
    }}
    if args.json.exists():
        with open(args.json) as f:
            prior = json.load(f)
        for side in ("reference", "ours"):
            kept = [r for r in prior.get(side, []) if "seed" in r]
            if kept:
                results[side] = kept
                print(f"resuming: kept {len(kept)} prior {side} cell(s) "
                      f"(seeds {[r['seed'] for r in kept]})", flush=True)
        prior_seeds = prior.get("protocol", {}).get("seeds", [])
        results["protocol"]["seeds"] = sorted(
            set(args.seeds) | set(prior_seeds)
        )

    def checkpoint_cell(side, seed, cell):
        cell = {"seed": seed, **cell}
        rows = results[side]
        rows[:] = [r for r in rows if r.get("seed") != seed]
        rows.append(cell)
        rows.sort(key=lambda r: r["seed"])
        args.json.parent.mkdir(parents=True, exist_ok=True)
        tmp = args.json.with_suffix(".tmp")
        with open(tmp, "w") as f:
            json.dump(results, f, indent=1)
        os.replace(tmp, args.json)  # crash-consistent: full file or old

    for seed in args.seeds:
        train_split, val_split = make_split(seed)
        if args.side in ("both", "reference"):
            print(f"=== seed {seed}: reference (torch) ===", flush=True)
            ref = run_reference(seed, train_split, val_split, args.epochs,
                                protocol=protocol)
            print(f"  -> {ref}", flush=True)
            checkpoint_cell("reference", seed, ref)
        if args.side in ("both", "ours"):
            print(f"=== seed {seed}: manipose_tpu ===", flush=True)
            ours = run_ours(seed, train_split, val_split, args.epochs,
                            protocol=protocol)
            print(f"  -> {ours}", flush=True)
            checkpoint_cell("ours", seed, ours)

    def stats(rows, key):
        v = np.asarray([r[key] for r in rows])
        return f"{v.mean():8.3f} ± {v.std():6.3f}"

    keys = ["best_val_mpjpe", "final_mpjpe", "mpsce", "mpsse"]
    if protocol == "3dhp":
        keys += ["pck", "auc", "agg_pck", "agg_auc"]
    print("\nmetric                reference             ours")
    for key in keys:
        have = [
            side for side in ("reference", "ours")
            if results[side] and all(key in r for r in results[side])
        ]
        cols = {
            side: (stats(results[side], key) if side in have
                   else " " * 8 + "(absent)")
            for side in ("reference", "ours")
        }
        print(f"{key:20s} {cols['reference']}   {cols['ours']}")
    print(f"\nwrote {args.json}")


if __name__ == "__main__":
    main()
