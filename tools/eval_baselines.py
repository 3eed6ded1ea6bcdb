#!/usr/bin/env python
"""Consistency metrics (MPSSE/MPSCE/MPJPE/segment errors) on dumped
third-party model predictions — cross-model sanity of the metric stack
(reference: hpe/useful_aux_scripts/eval_baselines.py, which scores
PoseFormer/P-STMO dumps).

Input: a .npy/.npz file with predictions of shape (N, L, J, 3) in mm and
optionally targets of the same shape.

  python tools/eval_baselines.py preds.npy [targets.npy] [--skeleton=3dhp]
      [--pck] [--alignment=none|scale|procrustes]

With --pck (and targets given) additionally scores the dumps with the
3DHP protocol: 3DPCK@150mm and AUC over 31 thresholds in [0, 150] mm
(reference: eval_baselines_mpi.py:80-116 scoring P-STMO dumps with
keypoint_3d_pck/keypoint_3d_auc).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from manipose_tpu.utils.platform import apply_platform_env  # noqa: E402

apply_platform_env()

import jax.numpy as jnp
import numpy as np

from manipose_tpu.data.dhp3 import dhp3_skeleton
from manipose_tpu.geometry import h36m_skeleton_17
from manipose_tpu.metrics import (
    keypoint_3d_auc,
    keypoint_3d_pck,
    mpjpe_error,
    p_mpjpe,
    sagittal_symmetry,
    sagittal_symmetry_per_bone,
    segments_len_err,
    segments_time_consistency,
    segments_time_consistency_per_bone,
)


def load_array(path):
    arr = np.load(path, allow_pickle=True)
    if hasattr(arr, "files"):
        arr = arr[arr.files[0]]
    return np.asarray(arr, np.float32)


def main(argv):
    assert argv, __doc__
    skeleton = (
        dhp3_skeleton() if "--skeleton=3dhp" in argv else h36m_skeleton_17()
    )
    paths = [a for a in argv if not a.startswith("--")]
    preds = jnp.asarray(load_array(paths[0]))
    assert preds.ndim == 4 and preds.shape[-1] == 3, preds.shape
    n, l, j, _ = preds.shape
    flat = preds.reshape(1, n * l, j, 3)

    print(f"predictions: {preds.shape}")
    print(
        "MPSSE (mm):",
        float(sagittal_symmetry(preds, skeleton, "average", squared=False)),
    )
    print("MPSCE (mm):", float(segments_time_consistency(flat, skeleton, "std")))
    print(
        "per-bone MPSCE:",
        np.asarray(segments_time_consistency_per_bone(flat, skeleton, "std")),
    )
    print(
        "per-bone MPSSE:",
        np.asarray(
            sagittal_symmetry_per_bone(preds, skeleton, "average", squared=False)
        ),
    )
    if len(paths) > 1:
        targets = jnp.asarray(load_array(paths[1]))
        print("MPJPE (mm):", float(mpjpe_error(preds, targets, "average")))
        print("P-MPJPE (mm):", float(p_mpjpe(preds, targets)))
        print(
            "segment err (mm):",
            float(segments_len_err(preds, targets, skeleton, "average",
                                   signed=False)),
        )
        if "--pck" in argv:
            alignment = "none"
            for a in argv:
                if a.startswith("--alignment="):
                    alignment = a.split("=", 1)[1]
            # 3DHP protocol over pooled frames (eval_baselines_mpi.py:80-116)
            p = preds.reshape(n * l, j, 3)
            g = targets.reshape(n * l, j, 3)
            print(
                f"3DPCK@150mm ({alignment}):",
                float(keypoint_3d_pck(p, g, alignment=alignment)),
            )
            print(
                f"AUC 0-150mm ({alignment}):",
                float(keypoint_3d_auc(p, g, alignment=alignment)),
            )


if __name__ == "__main__":
    main(sys.argv[1:])
