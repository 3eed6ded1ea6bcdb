"""Driver-level trained-model head-to-head on the 3DHP PROTOCOL: the
reference's own main_3dhp.py training copy + PCK@150/AUC test block vs
ours (tools/dhp3_head_to_head.py). Slow: trains both sides."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))


@pytest.mark.slow
def test_trained_pck_auc_comparable():
    from h36m_head_to_head import make_split, run_ours, run_reference

    seed, epochs = 0, 6
    train_split, val_split = make_split(seed)

    ref = run_reference(seed, train_split, val_split, epochs,
                        protocol="3dhp")
    ours = run_ours(seed, train_split, val_split, epochs, protocol="3dhp")

    # the protocol emits the full 3DHP metric set on both sides
    for k in ("pck", "auc", "agg_pck", "agg_auc", "mpsce", "mpsse"):
        assert np.isfinite(ref[k]) and np.isfinite(ours[k]), (k, ref, ours)
    for k in ("pck", "auc", "agg_pck", "agg_auc"):
        assert 0.0 <= ref[k] <= 100.0 and 0.0 <= ours[k] <= 100.0, (k,)
    # both stacks learn something: PCK@150 meaningfully above the
    # untrained level (~9% at this scale, see the 1-epoch smoke)
    assert ref["agg_pck"] > 15.0, ref
    assert ours["agg_pck"] > 15.0, ours
    # trained outcomes in the same band (different inits/orderings)
    assert abs(ours["agg_pck"] - ref["agg_pck"]) < 25.0, (ref, ours)
    assert abs(ours["auc"] - ref["auc"]) < 15.0, (ref, ours)
