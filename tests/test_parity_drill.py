"""End-to-end proof of the real-data parity drill (VERDICT r3 #3).

Real H36M npz + released .pth cannot exist in this environment, so the
drill is exercised on synthetic stand-ins written in the reference's
EXACT on-disk formats: ``tools/make_synthetic_h36m.py`` emits
``data_3d_h36m.npz`` / ``data_2d_h36m_cpn_ft_h36m_dbb.npz`` and a
reference-side ``state_dict()`` (wrapped ``{"model_pos": ...}`` with
DataParallel ``module.`` prefixes, the released-checkpoint shape,
``main_h36m_lifting.py:755-761``) provides the .pth. The reference side
reads those files through its OWN ``fetch_and_prepare_data`` +
``create_dataloader`` + ``evaluate``; ours through the eval-only driver
path. The same weights on the same files must land within the drill's
0.1mm MPJPE parity target.
"""

import json
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO / "tools"))

TINY = dict(
    seq_len=27, channels=32, layers=2, nheads=4,
    channels_seg=16, layers_seg=2, nheads_seg=4, n_hyp=2,
)


@pytest.fixture(scope="module")
def drill_inputs(tmp_path_factory):
    """Synthetic reference-format data dir + a tiny reference .pth."""
    import torch

    from conftest import install_driver_stubs
    from make_synthetic_h36m import generate
    from test_geometry import _reference_h36m_17

    data_dir = tmp_path_factory.mktemp("drill_data")
    generate(data_dir, subjects=["S11"], n_actions=2, n_frames=54, seed=3)

    ref_rmcl = install_driver_stubs()
    torch.manual_seed(0)
    model = ref_rmcl.RMCLManifoldMixSTE(
        skeleton=_reference_h36m_17(), num_frame=TINY["seq_len"],
        num_joints=17, num_bones=16, n_hyp=TINY["n_hyp"],
        embed_dim_rot=TINY["channels"], depth_rot=TINY["layers"],
        num_heads_rot=TINY["nheads"], embed_dim_seg=TINY["channels_seg"],
        depth_seg=TINY["layers_seg"], num_heads_seg=TINY["nheads_seg"],
        drop_path_rate=0.0,
    )
    ckpt = data_dir / "tiny_manipose_h36m.pth"
    torch.save(
        {"model_pos": {
            f"module.{k}": v for k, v in model.state_dict().items()
        }},
        ckpt,
    )
    return data_dir, ckpt


def test_drill_end_to_end_parity(drill_inputs, tmp_path, capsys):
    data_dir, ckpt = drill_inputs
    import parity_drill

    out = tmp_path / "drill.json"
    argv = [
        "--data-dir", str(data_dir), "--checkpoint", str(ckpt),
        "--batch-size-test", "4", "--out", str(out), "--strict",
    ]
    for key, value in TINY.items():
        argv += [f"--{key.replace('_', '-')}", str(value)]
    parity_drill.main(argv)

    printed = capsys.readouterr().out
    assert "PARITY" in printed and "DIVERGENT" not in printed
    report = json.loads(out.read_text())
    assert report["parity"] is True
    assert report["mpjpe_delta_mm"] <= 0.1
    # both sides saw the same two actions, discovered from the files
    assert set(report["ref"]) == set(report["ours"])
    assert len(report["ref"]) == 2
    # every drill column agrees to sub-0.5mm on every action (the same
    # weights through two independent eval stacks)
    for action, ref_row in report["ref"].items():
        for key, ref_value in ref_row.items():
            assert abs(report["ours"][action][key] - ref_value) < 0.5, (
                action, key, ref_value, report["ours"][action][key]
            )


def test_drill_3dhp_end_to_end_parity(tmp_path, capsys):
    """The second released checkpoint's protocol (manipose_3dhp.pth):
    reference's own Dataset3DHP + PCK@150/AUC test block vs our 3DHP
    eval-only driver, same data_test_3dhp.npz + .pth."""
    import torch

    from conftest import install_driver_stubs
    from make_synthetic_3dhp import generate as generate_3dhp
    from test_geometry import _reference_h36m_17
    import parity_drill

    data_dir = tmp_path / "data"
    generate_3dhp(data_dir, train_seqs=1, cams=1, frames=60,
                  test_frames=60, seed=5)
    ref_rmcl = install_driver_stubs()
    torch.manual_seed(1)
    model = ref_rmcl.RMCLManifoldMixSTE(
        skeleton=_reference_h36m_17(), num_frame=TINY["seq_len"],
        num_joints=17, num_bones=16, n_hyp=TINY["n_hyp"],
        embed_dim_rot=TINY["channels"], depth_rot=TINY["layers"],
        num_heads_rot=TINY["nheads"], embed_dim_seg=TINY["channels_seg"],
        depth_seg=TINY["layers_seg"], num_heads_seg=TINY["nheads_seg"],
        drop_path_rate=0.0,
    )
    ckpt = tmp_path / "tiny_manipose_3dhp.pth"
    torch.save(model.state_dict(), ckpt)  # raw state dict flavor

    out = tmp_path / "drill.json"
    argv = [
        "--dataset", "3dhp", "--data-dir", str(data_dir),
        "--checkpoint", str(ckpt), "--batch-size-test", "4",
        "--out", str(out), "--strict",
    ]
    for key, value in TINY.items():
        argv += [f"--{key.replace('_', '-')}", str(value)]
    parity_drill.main(argv)

    printed = capsys.readouterr().out
    assert "PARITY" in printed and "DIVERGENT" not in printed
    report = json.loads(out.read_text())
    assert report["parity"] is True and report["mpjpe_delta_mm"] <= 0.1
    row_ref, row_ours = report["ref"]["all"], report["ours"]["all"]
    assert set(row_ref) == {
        "mpjpe", "sag_sym", "seg_std", "oracle", "ps_oracle",
        "pck", "auc", "agg_pck", "agg_auc",
    }
    for key, ref_value in row_ref.items():
        tol = 0.5 if key.endswith(("mpjpe", "sym", "std", "oracle")) else 0.2
        assert abs(row_ours[key] - ref_value) < tol, (key, ref_value,
                                                     row_ours[key])


def test_drill_missing_inputs_fail_fast(tmp_path):
    import parity_drill

    with pytest.raises(SystemExit, match="missing input"):
        parity_drill.main([
            "--data-dir", str(tmp_path), "--checkpoint",
            str(tmp_path / "nope.pth"),
        ])
