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


_RETRY_SNIPPET = """
import os, sys
sys.path.insert(0, {repo!r})
os.environ["BENCH_RETRY_BUDGET_S"] = "5"
os.environ["BENCH_RETRY_INTERVAL_S"] = "0.01"
import bench

real_probe = bench._probe_device_subprocess  # before any monkeypatching

# (a) recovery: two failed probes then a healthy one -> returns
calls = []
def flaky(deadline_s):
    calls.append(1)
    return (len(calls) >= 3), True, "simulated outage"
bench._probe_device_subprocess = flaky
bench._await_device_or_exit()
assert len(calls) == 3, calls
print("RECOVERED", flush=True)

# (b) persistent outage: budget exhausted -> SystemExit(3)
os.environ["BENCH_RETRY_BUDGET_S"] = "0.05"
bench._probe_device_subprocess = lambda d: (False, True, "still down")
try:
    bench._await_device_or_exit()
except SystemExit as e:
    assert e.code == 3, e.code
    print("GAVE_UP_RC3", flush=True)
else:
    raise AssertionError("expected SystemExit(3)")

# (c) deterministic failure -> immediate fail-fast with rc=4 (distinct
# from the rc=3 outage diagnosis), no retry burn
os.environ["BENCH_RETRY_BUDGET_S"] = "600"
calls2 = []
def broken(deadline_s):
    calls2.append(1)
    return False, False, "ModuleNotFoundError: jax"
bench._probe_device_subprocess = broken
import time as _time
_t0 = _time.monotonic()
try:
    bench._await_device_or_exit()
except SystemExit as e:
    assert e.code == 4, e.code
    assert len(calls2) == 1, calls2
    assert _time.monotonic() - _t0 < 5
    print("FAILED_FAST_RC4", flush=True)
else:
    raise AssertionError("expected SystemExit(4)")

# (d) a probe child killed by a signal (negative rc, e.g. OOM SIGKILL
# during an outage window) classifies as RETRYABLE, not deterministic
class FakeProc:
    returncode = -9
    stderr = "killed"
    stdout = ""
import subprocess as _sp
_orig_run = _sp.run
_sp.run = lambda *a, **k: FakeProc()
try:
    ok, retryable, diag = real_probe(5.0)
finally:
    _sp.run = _orig_run
assert not ok and retryable, (ok, retryable, diag)
print("SIGNAL_RETRYABLE", flush=True)
"""


def test_retry_loop_recovers_and_gives_up(tmp_path):
    """VERDICT r3 #2: bench must survive a transient outage (bounded
    retries) and still emit the crisp rc=3 path when the outage outlasts
    the budget. Probe is monkeypatched — the real subprocess probe is
    covered by test_probe_subprocess_healthy below."""
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, "-c", _RETRY_SNIPPET.format(repo=repo)],
        capture_output=True, text=True, timeout=120,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "RECOVERED" in proc.stdout
    assert "GAVE_UP_RC3" in proc.stdout
    assert "FAILED_FAST_RC4" in proc.stdout
    assert "SIGNAL_RETRYABLE" in proc.stdout
    assert "deterministically" in proc.stderr
    assert "tunnel recovered within the retry budget" in proc.stderr
    assert "giving up after" in proc.stderr


def test_probe_subprocess_healthy(tmp_path):
    """The real probe subprocess returns ok on a healthy (CPU) backend
    and relays the devices line to stderr."""
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    snippet = (
        f"import sys; sys.path.insert(0, {repo!r})\n"
        "import bench\n"
        "ok, retryable, diag = bench._probe_device_subprocess(60.0)\n"
        "assert ok and not retryable, (retryable, diag)\n"
        "print('PROBE_OK', flush=True)\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", snippet],
        capture_output=True, text=True, timeout=300,
        env={**os.environ, "MANIPOSE_PLATFORM": "cpu",
             "JAX_PLATFORMS": "cpu"},
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "PROBE_OK" in proc.stdout
    assert "devices:" in proc.stderr


def test_soft_deadline_never_voids_the_run():
    """_soft_deadline guards the MFU anchor probes: value on success,
    None + flag on timeout/exception — the graded JSON line must land
    either way (the 2026-08-21 flapping-tunnel mode hangs RPCs between
    healthy windows)."""
    import os
    import subprocess as sp
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    snippet = f"""
import sys, time
sys.path.insert(0, {repo!r})
import bench
assert bench._soft_deadline(lambda: 41, "ok", 30.0) == 41
assert not bench._soft_deadline_timed_out
assert bench._soft_deadline(
    lambda: (_ for _ in ()).throw(ValueError("x")), "boom", 30.0) is None
assert not bench._soft_deadline_timed_out  # exception != timeout
assert bench._soft_deadline(lambda: time.sleep(60), "hang", 0.5) is None
assert bench._soft_deadline_timed_out
print("SOFT_OK", flush=True)
"""
    proc = sp.run(
        [sys.executable, "-c", snippet], capture_output=True, text=True,
        timeout=120, env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "SOFT_OK" in proc.stdout
    assert "continuing without it" in proc.stderr
    assert "failed: ValueError" in proc.stderr


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
