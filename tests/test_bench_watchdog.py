"""bench.py watchdog: a hung tunnel RPC must fail fast with a diagnosis.

Observed 2026-08-20: ``jax.devices()`` answers while the tunnel's
compile/execute service hangs every RPC — bench then stalled silently
until the outer timeout with no JSON line and no diagnosis. The
``_force_with_deadline`` watchdog converts that into rc=3 plus an
attributed stderr message (the graded driver records bench's tail).

Runs in a subprocess: importing bench.py repoints the process-wide JAX
compilation-cache config, which must not leak into the suite's pinned
cache.
"""

import subprocess
import sys

import pytest

pytestmark = pytest.mark.filterwarnings("ignore")

_SNIPPET = """
import sys, time
sys.path.insert(0, {repo!r})
import bench

# completing fn -> value returned
assert bench._force_with_deadline(lambda: 7, "ok", 30.0) == 7

# raising fn -> exception re-raised
try:
    bench._force_with_deadline(
        lambda: (_ for _ in ()).throw(ValueError("boom")), "raise", 30.0
    )
except ValueError as e:
    assert "boom" in str(e)
else:
    raise AssertionError("exception not re-raised")

print("PRE_OK", flush=True)

# hung fn -> diagnosed hard exit (rc=3); never returns
bench._force_with_deadline(lambda: time.sleep(60), "hung-rpc-sim", 1.0)
print("UNREACHABLE", flush=True)
"""


def test_preflight_completes_on_healthy_backend():
    from manipose_tpu.utils.platform import preflight_device_or_exit

    # healthy (CPU test) backend: returns quietly, costs one tiny matmul
    preflight_device_or_exit(30.0, tool="test")


def test_force_with_deadline_diagnoses_hung_rpc(tmp_path):
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, "-c", _SNIPPET.format(repo=repo)],
        capture_output=True,
        text=True,
        timeout=120,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert "PRE_OK" in proc.stdout
    assert "UNREACHABLE" not in proc.stdout
    assert proc.returncode == 3, proc.stderr
    assert "unresponsive" in proc.stderr
    assert "hung-rpc-sim" in proc.stderr
