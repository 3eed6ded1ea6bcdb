"""Multi-host utilities, exercised in their single-process degradation
mode (the only mode reachable in CI — the semantics that must hold are
that single-process behavior is exactly the plain-mesh path)."""

import numpy as np

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
