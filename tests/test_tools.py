"""Smoke coverage for the remaining CLI tools (count_n_params,
get_table_data, mup_coord_check) — each must run end-to-end and produce
sane output."""

import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]


def _run(args, timeout=900):
    out = subprocess.run(
        [sys.executable, *args], capture_output=True, text=True,
        timeout=timeout, cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    return out.stdout


def test_count_n_params_small_config():
    stdout = _run([
        "tools/count_n_params.py", "model.channels=64", "model.layers=2",
        "model.channels_seg=32", "model.layers_seg=2", "data.seq_len=27",
    ])
    # all three families reported with positive counts
    for arch in ("mixste", "manifold", "rmcl_manifold"):
        assert arch in stdout, stdout
    import re

    counts = [int(s.replace(",", ""))
              for s in re.findall(r"([\d,]{4,}) params", stdout)]
    assert len(counts) == 3 and all(c > 10_000 for c in counts), stdout


def test_get_table_data_aggregates_seeds(tmp_path):
    for seed, mpjpe in ((1, 0.70), (2, 0.74), (3, 0.72)):
        d = tmp_path / f"manipose_seed{seed}"
        d.mkdir()
        (d / "metrics.txt").write_text(
            f"test_mpjpe: {mpjpe}\ntest_dtc: 0.0\n"
        )
    stdout = _run(["tools/get_table_data.py",
                   *(str(p) for p in sorted(tmp_path.iterdir()))])
    assert "manipose" in stdout
    assert "0.72" in stdout  # the mean over the three seeds


@pytest.mark.slow
def test_mup_coord_check_runs():
    stdout = _run([
        "tools/mup_coord_check.py", "--widths", "32,64", "--steps", "2",
    ])
    assert "width" in stdout and "trunk|a|" in stdout, stdout
