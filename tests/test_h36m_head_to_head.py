"""Driver-level trained-model head-to-head on the flagship task: the
reference's full H36M training stack vs ours on identical synthetic
data (tools/h36m_head_to_head.py). Slow: trains both sides."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))


@pytest.mark.slow
def test_trained_outcomes_comparable():
    from h36m_head_to_head import make_split, run_ours, run_reference

    seed, epochs = 0, 6
    train_split, val_split = make_split(seed)

    # predict-zero baseline on the val targets (mm)
    baseline = 1000.0 * float(
        np.mean([
            np.linalg.norm(v, axis=-1).mean() for v in val_split[0]
        ])
    )

    ref = run_reference(seed, train_split, val_split, epochs)
    ours = run_ours(seed, train_split, val_split, epochs)

    # both stacks learn: far below the predict-zero baseline
    assert ref["best_val_mpjpe"] < 0.8 * baseline, (ref, baseline)
    assert ours["best_val_mpjpe"] < 0.8 * baseline, (ours, baseline)
    # trained outcomes in the same band (different inits/orderings; the
    # full-protocol multi-seed table lives in BASELINE.md)
    assert (
        abs(ours["best_val_mpjpe"] - ref["best_val_mpjpe"])
        < 0.35 * ref["best_val_mpjpe"]
    ), (ref, ours)
    for k in ("mpsce", "mpsse"):
        assert np.isfinite(ref[k]) and np.isfinite(ours[k])
