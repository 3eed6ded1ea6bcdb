"""Trained-model parity vs the reference toy experiments (VERDICT r1
item #2): train the reference's own torch code and this framework on
IDENTICAL data and assert the outcome metrics agree.

Full 5-seed tables live in BASELINE.md / tools/artifacts; here one seed
per scenario is trained end-to-end (minutes, slow-marked) with generous
tolerances sized from the measured 5-seed spread.
"""

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO / "tools"))

import toy_head_to_head as tth  # noqa: E402


@pytest.mark.slow
def test_hard2_trained_outcome_parity():
    splits = tth.sample_circle(42)
    ref = {}
    ours = {}
    for arch in tth.ARCHS:
        ref[arch] = tth.run_reference("hard-2", arch, 42, splits)
        ours[arch] = tth.run_ours("hard-2", arch, 42, splits)

    for arch in tth.ARCHS:
        # measured 5-seed std is ~0.01-0.02; allow 5x that
        assert abs(ref[arch]["test_mpjpe"] - ours[arch]["test_mpjpe"]) < 0.1, (
            arch, ref[arch], ours[arch]
        )
    # the paper's qualitative claim: constrained => exactly on the circle
    assert abs(ours["constrained"]["test_dtc"]) < 1e-5
    assert abs(ref["constrained"]["test_dtc"]) < 1e-5
    # plain MLP is off-manifold on both sides
    assert ours["mlp"]["test_dtc"] > 0.1 and ref["mlp"]["test_dtc"] > 0.1


@pytest.mark.slow
def test_torus_trained_outcome_parity():
    splits = tth.sample_torus(42, n=(8000, 1000, 1000))  # trimmed for CI time
    ref = {}
    ours = {}
    for arch in tth.ARCHS:
        ref[arch] = tth.run_reference("torus", arch, 42, splits)
        ours[arch] = tth.run_ours("torus", arch, 42, splits)

    for arch in tth.ARCHS:
        assert abs(ref[arch]["test_mpjpe"] - ours[arch]["test_mpjpe"]) < 0.15, (
            arch, ref[arch], ours[arch]
        )
    # manifold property: constrained/rMCL bone lengths exactly consistent
    assert abs(ours["constrained"]["std_length"]) < 1e-4
    assert abs(ours["constrained_rmcl"]["std_length"]) < 1e-4
    assert ours["mlp"]["std_length"] > 0.05 and ref["mlp"]["std_length"] > 0.05
