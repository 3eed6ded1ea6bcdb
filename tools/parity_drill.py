#!/usr/bin/env python
"""One-command real-data parity drill: reference driver vs this framework.

Given the reference's on-disk inputs and a released torch checkpoint,
this runs the REFERENCE'S OWN eval (its ``fetch_and_prepare_data`` +
``create_dataloader`` + ``eval_utils.evaluate`` + test-protocol
metrics, imported read-only from /root/reference) and OUR eval-only
driver path (the .pth through the checkpoint converter) on the SAME
files, then prints the comparison table with deltas against the ≤0.1mm
parity target. Both released checkpoints are covered:

    # H36M (data_3d_h36m.npz + data_2d_h36m_<keypoints>.npz):
    # per-action S11 protocol, MPJPE/MPSSE/MPSCE/P-MPJPE/oracle
    python tools/parity_drill.py --data-dir /path/to/h36m \\
        --checkpoint /path/to/manipose_h36m.pth

    # MPI-INF-3DHP (data_test_3dhp.npz): PCK@150/AUC protocol
    python tools/parity_drill.py --dataset 3dhp --data-dir /path/to/3dhp \\
        --checkpoint /path/to/manipose_3dhp.pth

Real H36M npz files and the released checkpoints cannot be obtained in
this environment (zero egress) — the drill is proven end-to-end on
synthetic stand-ins written in the reference's EXACT formats
(``tools/make_synthetic_h36m.py`` for the data;
``train.checkpoint.save_torch_checkpoint`` / a reference-side
``state_dict()`` for the .pth), with the reference side reading those
files through its own ``fetch_and_prepare_data``
(``main_h36m_lifting.py:511-540``). See ``tests/test_parity_drill.py``.

Determinism note (documented divergence, drill-only): the reference's
``create_dataloader`` applies the random ``PoseFlip`` transform to EVAL
windows whenever ``train.flip_aug`` is true (its default config;
``main_h36m_lifting.py:586-598`` + ``transforms.py:22-28``), making its
published protocol stochastic per run. The drill pins flip_aug off on
both sides so the comparison is bit-stable; pass ``--flip-aug`` to
reproduce the reference's noisy default (expect mm-scale run-to-run
spread on both sides). TTA (the deterministic eval-time flip averaging,
``eval_utils.py:78-142``) stays ON by default, as in the README eval
commands.
"""

from __future__ import annotations

import argparse
import json
import sys
import types
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))
sys.path.insert(0, str(REPO / "tools"))

from manipose_tpu.utils.platform import apply_platform_env  # noqa: E402

apply_platform_env()

import numpy as np  # noqa: E402

# conftest side effects BEFORE any JAX backend init: pins the CPU
# backend (8 virtual devices) + per-host compile cache, and provides the
# read-only reference loaders. The reference side is CPU torch, so
# identical fp32 CPU backends keep the <=0.1mm comparison
# apples-to-apples; an on-chip eval of the same checkpoint is one driver
# command (`run.train=false run.checkpoint_model=<pth>`).
import conftest  # noqa: E402,F401

COLUMNS_H36M = [
    ("mpjpe", "MPJPE"),
    ("sag_sym", "MPSSE"),
    ("seg_std", "MPSCE"),
    ("p_mpjpe", "P-MPJPE"),
    ("oracle", "oracle"),
    ("ps_oracle", "ps-oracle"),
]
COLUMNS_3DHP = [
    ("mpjpe", "MPJPE"),
    ("sag_sym", "MPSSE"),
    ("seg_std", "MPSCE"),
    ("oracle", "oracle"),
    ("ps_oracle", "ps-oracle"),
    ("pck", "PCK@150"),
    ("auc", "AUC"),
    ("agg_pck", "aggPCK"),
    ("agg_auc", "aggAUC"),
]
# per-dataset defaults for args passed as None (reference configs:
# hpe/conf/config.yaml + conf/data/mpi_inf_3dhp.yaml; 3DHP eval cmd
# README.md:61-71 uses bs 30)
DATASET_DEFAULTS = {
    "h36m": {"seq_len": 243, "keypoints": "cpn_ft_h36m_dbb",
             "batch_size_test": 10},
    "3dhp": {"seq_len": 27, "keypoints": "gt", "batch_size_test": 30},
}


def parse_args(argv=None):
    ap = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter
    )
    ap.add_argument("--data-dir", type=Path, required=True,
                    help="h36m: dir with data_3d_h36m.npz + the 2D npz; "
                    "3dhp: dir with data_test_3dhp.npz")
    ap.add_argument("--checkpoint", type=Path, required=True,
                    help="reference-format .pth (manipose_h36m.pth / "
                    "manipose_3dhp.pth)")
    ap.add_argument("--dataset", choices=["h36m", "3dhp"], default="h36m")
    ap.add_argument("--keypoints", default=None)
    ap.add_argument("--seq-len", type=int, default=None)
    ap.add_argument("--channels", type=int, default=512)
    ap.add_argument("--layers", type=int, default=8)
    ap.add_argument("--nheads", type=int, default=8)
    ap.add_argument("--channels-seg", type=int, default=128)
    ap.add_argument("--layers-seg", type=int, default=2)
    ap.add_argument("--nheads-seg", type=int, default=8)
    ap.add_argument("--n-hyp", type=int, default=5)
    ap.add_argument("--batch-size-test", type=int, default=None)
    ap.add_argument("--test-subjects", nargs="+", default=["S11"],
                    help="the reference test block hardcodes S11 "
                    "(main_h36m_lifting.py:890-891)")
    ap.add_argument("--actions", nargs="+", default=None,
                    help="lowercase base action names; default: all "
                    "actions present for the test subjects")
    ap.add_argument("--no-tta", dest="tta", action="store_false")
    ap.add_argument("--flip-aug", action="store_true",
                    help="reproduce the reference's stochastic eval-flip "
                    "default (see module docstring)")
    ap.add_argument("--threshold-mm", type=float, default=0.1,
                    help="MPJPE parity target on the mean row")
    ap.add_argument("--strict", action="store_true",
                    help="exit 2 when the MPJPE delta exceeds the target")
    ap.add_argument("--out", type=Path, default=None,
                    help="write the full comparison as JSON")
    args = ap.parse_args(argv)
    if args.n_hyp < 2:
        ap.error(
            "--n-hyp must be >= 2: the drill drives the released rMCL "
            "checkpoints' protocol (single-hypothesis archs have no "
            "oracle/score columns to compare)"
        )
    for key, value in DATASET_DEFAULTS[args.dataset].items():
        if getattr(args, key) is None:
            setattr(args, key, value)
    return args


def discover_actions(data_dir: Path, keypoints: str, subjects) -> list:
    """Lowercase base action names present for the test subjects, as the
    reference's fetch matches them (``data/utils.py:82-89``)."""
    kp = np.load(
        data_dir / f"data_2d_h36m_{keypoints}.npz", allow_pickle=True
    )["positions_2d"].item()
    names = sorted({
        action.lower().split(" ")[0]
        for subject in subjects
        for action in kp[subject]
    })
    assert names, f"no actions found for {subjects} in {data_dir}"
    return names


# ---------------------------------------------------------------------------
# reference side (torch, imported read-only from /root/reference)
# ---------------------------------------------------------------------------
def run_reference_h36m(args, actions) -> dict:
    import torch

    from conftest import install_driver_stubs, load_ref_module

    ref_rmcl_mod = install_driver_stubs()
    ref_main = load_ref_module("main_h36m_lifting")
    ref_eval = load_ref_module("eval_utils")
    ref_reg = load_ref_module("mh_so3_hpe.metrics.regularizations")
    ref_mje = load_ref_module("mh_so3_hpe.metrics.mean_joint_errors")

    cfg = types.SimpleNamespace(
        data=types.SimpleNamespace(
            data_dir=str(args.data_dir), dataset="h36m", joints=17,
            keypoints=args.keypoints, seq_len=args.seq_len,
            miss_type="no_miss", miss_rate=0.0, noise_sigma=0,
        ),
        train=types.SimpleNamespace(
            batch_size=args.batch_size_test,
            batch_size_test=args.batch_size_test, workers=0,
            flip_aug=args.flip_aug, tta=args.tta,
        ),
        multi_hyp=types.SimpleNamespace(
            n_hyp=args.n_hyp, agg_strategy="average"
        ),
        viz=types.SimpleNamespace(hypothesis=False),
    )

    # the reference's own data path: npz -> Human36mDataset ->
    # read_3d_data -> create_2d_data (with its pickle cache)
    keypoints, dataset = ref_main.fetch_and_prepare_data(cfg, "paritydrill")

    model = ref_rmcl_mod.RMCLManifoldMixSTE(
        skeleton=dataset.skeleton, num_frame=args.seq_len, num_joints=17,
        num_bones=16, n_hyp=args.n_hyp,
        embed_dim_rot=args.channels, depth_rot=args.layers,
        num_heads_rot=args.nheads, embed_dim_seg=args.channels_seg,
        depth_seg=args.layers_seg, num_heads_seg=args.nheads_seg,
        drop_path_rate=0.0,
    )
    state = torch.load(args.checkpoint, map_location="cpu")
    # the reference accepts raw state dicts or {"model_pos": ...} wrappers
    # with optional DataParallel "module." prefixes (:755-761)
    if isinstance(state, dict) and "model_pos" in state:
        state = state["model_pos"]
    state = {k.removeprefix("module."): v for k, v in state.items()}
    model.load_state_dict(state)
    model.eval()

    rows = {}
    for action in actions:
        loader = ref_main.create_dataloader(
            keypoints=keypoints, dataset=dataset, action_filter=[action],
            subjects=list(args.test_subjects), cfg=cfg, train=False,
        )
        preds, targets, mpjpe, o_mpjpe, pso_mpjpe, oracle_preds = (
            ref_eval.evaluate(
                model=model, loader=loader, device="cpu", config=cfg,
                skeleton=dataset.skeleton, compute_oracle=True,
            )
        )
        with torch.no_grad():
            # the reference test block computes rows 1-7 on the ORACLE
            # preds: its RMCL branch unpacks evaluate()'s 6th output as
            # `generated_poses` (main_h36m_lifting.py:884-935), which is
            # all_oracle_preds (eval_utils.py:197-203)
            gen = torch.cat(oracle_preds, dim=0).permute(0, 3, 2, 1)  # B,3,J,L mm
            _, _, j, _ = gen.shape
            tgt_mm = torch.cat(targets, dim=0) * 1000
            rows[action] = {
                "mpjpe": float(mpjpe),
                "sag_sym": float(ref_reg.sagittal_symmetry(
                    joints_coords=gen, skeleton=dataset.skeleton,
                    mode="average", squared=False,
                )),
                "seg_std": float(ref_reg.segments_time_consistency(
                    joints_coords=gen.permute(1, 2, 0, 3).reshape(1, 3, j, -1),
                    skeleton=dataset.skeleton, mode="std",
                )),
                "p_mpjpe": float(ref_mje.p_mpjpe(
                    predicted=gen.permute(0, 3, 2, 1), target=tgt_mm,
                )),
                "oracle": float(o_mpjpe),
                "ps_oracle": float(pso_mpjpe),
            }
        print(f"  reference {action}: mpjpe={rows[action]['mpjpe']:.3f}mm",
              flush=True)
    return rows


# ---------------------------------------------------------------------------
# our side (the real eval-only driver path)
# ---------------------------------------------------------------------------
def run_ours_h36m(args, actions, tmp_out) -> dict:
    import jax
    import jax.numpy as jnp

    from manipose_tpu.config import load_config
    from manipose_tpu.drivers.common import instantiate_model
    from manipose_tpu.drivers.h36m import (
        fetch_and_prepare_data, run_test_protocol,
    )
    from manipose_tpu.train.checkpoint import load_torch_checkpoint

    overrides = [
        f"data.data_dir={args.data_dir}",
        f"data.keypoints={args.keypoints}",
        f"data.seq_len={args.seq_len}",
        "data.miss_type=no_miss",
        f"model.channels={args.channels}",
        f"model.layers={args.layers}",
        f"model.nheads={args.nheads}",
        f"model.channels_seg={args.channels_seg}",
        f"model.layers_seg={args.layers_seg}",
        f"model.nheads_seg={args.nheads_seg}",
        f"multi_hyp.n_hyp={args.n_hyp}",
        f"train.batch_size_test={args.batch_size_test}",
        f"train.tta={str(args.tta).lower()}",
        f"train.flip_aug={str(args.flip_aug).lower()}",
        # parity-critical eval: fp32 activations like the reference
        "model.dtype=float32",
    ]
    cfg = load_config(overrides=overrides)
    cfg.run.test_subjects = list(args.test_subjects)

    keypoints, dataset = fetch_and_prepare_data(cfg)
    model, rmcl = instantiate_model(cfg, dataset.skeleton)
    variables = load_torch_checkpoint(str(args.checkpoint), cfg.model.arch)
    variables = jax.tree_util.tree_map(jnp.asarray, variables)

    errs, head = run_test_protocol(
        model.apply, variables, cfg, dataset, keypoints, rmcl, tmp_out,
        actions=list(actions),
    )
    key_by_col = {
        "mpjpe": 0, "sag_sym": 1, "seg_std": 2, "p_mpjpe": 3,
        "oracle": 8, "ps_oracle": 9,
    }
    rows = {}
    for i, action in enumerate(actions):
        rows[action] = {k: float(errs[i, c]) for k, c in key_by_col.items()}
        print(f"  ours {action}: mpjpe={rows[action]['mpjpe']:.3f}mm",
              flush=True)
    return rows


def run_reference_3dhp(args) -> dict:
    """The reference's own 3DHP eval: ``main_3dhp.fetch_and_prepare_data``
    (its ``Dataset3DHP`` reading ``data_test_3dhp.npz``) +
    ``create_dataloader`` + ``evaluate`` + the PCK@150/AUC test block
    (``main_3dhp.py:769-915``; consistency metrics on the ORACLE preds,
    pck/auc on oracle, agg_pck/agg_auc on the aggregated)."""
    import torch

    from conftest import install_driver_stubs, load_ref_module

    ref_rmcl_mod = install_driver_stubs()
    ref_main = load_ref_module("main_3dhp")
    ref_eval = load_ref_module("eval_utils")
    ref_reg = load_ref_module("mh_so3_hpe.metrics.regularizations")
    ref_pck = load_ref_module("mh_so3_hpe.metrics.pck")

    cfg = types.SimpleNamespace(
        data=types.SimpleNamespace(
            data_dir=str(args.data_dir), dataset="3dhp", joints=17,
            keypoints=args.keypoints, seq_len=args.seq_len,
            miss_type="no_miss", miss_rate=0.0, noise_sigma=0,
            actions="*", downsample=1, pad=0, out_all=True,
        ),
        train=types.SimpleNamespace(
            batch_size=args.batch_size_test,
            batch_size_test=args.batch_size_test, workers=0,
            flip_aug=args.flip_aug, tta=args.tta,
        ),
        multi_hyp=types.SimpleNamespace(
            n_hyp=args.n_hyp, agg_strategy="average"
        ),
        viz=types.SimpleNamespace(hypothesis=False),
    )
    dataset = ref_main.fetch_and_prepare_data(cfg, "paritydrill", train=False)

    model = ref_rmcl_mod.RMCLManifoldMixSTE(
        skeleton=dataset.skeleton, num_frame=args.seq_len, num_joints=17,
        num_bones=16, n_hyp=args.n_hyp,
        embed_dim_rot=args.channels, depth_rot=args.layers,
        num_heads_rot=args.nheads, embed_dim_seg=args.channels_seg,
        depth_seg=args.layers_seg, num_heads_seg=args.nheads_seg,
        drop_path_rate=0.0,
    )
    state = torch.load(args.checkpoint, map_location="cpu")
    if isinstance(state, dict) and "model_pos" in state:
        state = state["model_pos"]
    state = {k.removeprefix("module."): v for k, v in state.items()}
    model.load_state_dict(state)
    model.eval()

    loader = ref_main.create_dataloader(dataset=dataset, cfg=cfg, train=False)
    agg_list, targets, mpjpe, o_mpjpe, pso_mpjpe, oracle_preds = (
        ref_eval.evaluate(
            model=model, loader=loader, device="cpu", config=cfg,
            skeleton=dataset.skeleton, compute_oracle=True,
        )
    )
    with torch.no_grad():
        gen = torch.cat(oracle_preds, dim=0).permute(0, 3, 2, 1)  # B,3,J,L mm
        agg = torch.cat(agg_list, dim=0).permute(0, 3, 2, 1)
        _, _, j, _ = gen.shape
        tgt_mm = torch.cat(targets, dim=0) * 1000
        row = {
            "mpjpe": float(mpjpe),
            "sag_sym": float(ref_reg.sagittal_symmetry(
                joints_coords=gen, skeleton=dataset.skeleton,
                mode="average", squared=False,
            )),
            "seg_std": float(ref_reg.segments_time_consistency(
                joints_coords=gen.permute(1, 2, 0, 3).reshape(1, 3, j, -1),
                skeleton=dataset.skeleton, mode="std",
            )),
            "oracle": float(o_mpjpe),
            "ps_oracle": float(pso_mpjpe),
            "pck": float(ref_pck.keypoint_3d_pck(
                pred=gen.permute(0, 3, 2, 1).reshape(-1, j, 3),
                gt=tgt_mm.reshape(-1, j, 3), mask=None, threshold=150,
            )),
            "auc": float(ref_pck.keypoint_3d_auc(
                pred=gen.permute(0, 3, 2, 1).reshape(-1, j, 3),
                gt=tgt_mm.reshape(-1, j, 3), mask=None,
            )),
            "agg_pck": float(ref_pck.keypoint_3d_pck(
                pred=agg.permute(0, 3, 2, 1).reshape(-1, j, 3),
                gt=tgt_mm.reshape(-1, j, 3), mask=None, threshold=150,
            )),
            "agg_auc": float(ref_pck.keypoint_3d_auc(
                pred=agg.permute(0, 3, 2, 1).reshape(-1, j, 3),
                gt=tgt_mm.reshape(-1, j, 3), mask=None,
            )),
        }
    print(f"  reference 3dhp: mpjpe={row['mpjpe']:.3f}mm "
          f"pck={row['pck']:.2f}", flush=True)
    return {"all": row}


def run_ours_3dhp(args, tmp_out) -> dict:
    import jax
    import jax.numpy as jnp

    from manipose_tpu.config import load_config
    from manipose_tpu.data.dhp3 import Dataset3DHP
    from manipose_tpu.drivers.common import instantiate_model
    from manipose_tpu.drivers.dhp3 import run_test_protocol
    from manipose_tpu.train.checkpoint import load_torch_checkpoint

    overrides = [
        "data=mpi_inf_3dhp",
        f"data.data_dir={args.data_dir}",
        f"data.keypoints={args.keypoints}",
        f"data.seq_len={args.seq_len}",
        "data.miss_type=no_miss",
        f"model.channels={args.channels}",
        f"model.layers={args.layers}",
        f"model.nheads={args.nheads}",
        f"model.channels_seg={args.channels_seg}",
        f"model.layers_seg={args.layers_seg}",
        f"model.nheads_seg={args.nheads_seg}",
        f"multi_hyp.n_hyp={args.n_hyp}",
        f"train.batch_size_test={args.batch_size_test}",
        f"train.tta={str(args.tta).lower()}",
        f"train.flip_aug={str(args.flip_aug).lower()}",
        "model.dtype=float32",
    ]
    cfg = load_config(overrides=overrides)
    dataset = Dataset3DHP(cfg.data.data_dir, train=False)
    model, rmcl = instantiate_model(cfg, dataset.skeleton)
    variables = load_torch_checkpoint(str(args.checkpoint), cfg.model.arch)
    variables = jax.tree_util.tree_map(jnp.asarray, variables)
    metrics = run_test_protocol(
        model.apply, variables, cfg, dataset, rmcl, tmp_out
    )
    row = {
        "mpjpe": float(metrics["best_val_mpjpe"]),
        "sag_sym": float(metrics["sag_sym"]),
        "seg_std": float(metrics["seg_std"]),
        "oracle": float(metrics["best_val_oracle_mpjpe"]),
        "ps_oracle": float(metrics["best_val_ps_oracle_mpjpe"]),
        "pck": float(metrics["pck"]),
        "auc": float(metrics["auc"]),
        "agg_pck": float(metrics["agg_pck"]),
        "agg_auc": float(metrics["agg_auc"]),
    }
    print(f"  ours 3dhp: mpjpe={row['mpjpe']:.3f}mm pck={row['pck']:.2f}",
          flush=True)
    return {"all": row}


# ---------------------------------------------------------------------------
def compare(ref_rows: dict, our_rows: dict, threshold_mm: float, columns):
    actions = list(ref_rows)
    mean = {
        side: {
            k: float(np.mean([rows[a][k] for a in actions]))
            for k, _ in columns
        }
        for side, rows in (("ref", ref_rows), ("ours", our_rows))
    }

    name_w = max(len(a) for a in actions + ["average"]) + 2
    print("\n== parity drill: reference vs manipose_tpu (mm) ==")
    hdr = f"{'action':<{name_w}}" + "".join(
        f"{label + ' ref':>12}{'ours':>10}{'delta':>9}" for _, label in columns
    )
    print(hdr)
    for action in actions + ["average"]:
        r = ref_rows[action] if action in ref_rows else mean["ref"]
        o = our_rows[action] if action in our_rows else mean["ours"]
        line = f"{action:<{name_w}}"
        for k, _ in columns:
            line += f"{r[k]:>12.3f}{o[k]:>10.3f}{o[k] - r[k]:>9.3f}"
        print(line)

    delta = abs(mean["ours"]["mpjpe"] - mean["ref"]["mpjpe"])
    ok = delta <= threshold_mm
    print(
        f"\nmean MPJPE delta: {delta:.4f}mm vs target <= {threshold_mm}mm "
        f"-> {'PARITY' if ok else 'DIVERGENT'}"
    )
    return ok, delta, mean


def main(argv=None):
    args = parse_args(argv)
    required = [args.checkpoint]
    if args.dataset == "h36m":
        required += [
            args.data_dir / "data_3d_h36m.npz",
            args.data_dir / f"data_2d_h36m_{args.keypoints}.npz",
        ]
    else:
        required += [args.data_dir / "data_test_3dhp.npz"]
    for path in required:
        if not Path(path).exists():
            sys.exit(f"parity_drill: missing input {path}")

    import tempfile

    if args.dataset == "h36m":
        columns = COLUMNS_H36M
        actions = args.actions or discover_actions(
            args.data_dir, args.keypoints, args.test_subjects
        )
        print(f"actions: {actions}")
        with tempfile.TemporaryDirectory() as tmp:
            print("== running our eval-only driver ==", flush=True)
            our_rows = run_ours_h36m(args, actions, tmp)
        print("== running the reference's eval (torch CPU) ==", flush=True)
        ref_rows = run_reference_h36m(args, actions)
    else:
        columns = COLUMNS_3DHP
        with tempfile.TemporaryDirectory() as tmp:
            print("== running our eval-only driver ==", flush=True)
            our_rows = run_ours_3dhp(args, tmp)
        print("== running the reference's eval (torch CPU) ==", flush=True)
        ref_rows = run_reference_3dhp(args)

    ok, delta, mean = compare(ref_rows, our_rows, args.threshold_mm, columns)
    if args.out:
        args.out.write_text(json.dumps(
            {"ref": ref_rows, "ours": our_rows, "mean": mean,
             "mpjpe_delta_mm": delta, "parity": ok},
            indent=2,
        ))
        print(f"wrote {args.out}")
    if args.strict and not ok:
        sys.exit(2)


if __name__ == "__main__":
    main()
