"""Utility-layer tests (compile cache plumbing)."""

import jax

from manipose_tpu.utils.compile_cache import enable_compilation_cache


class TestCompilationCache:
    def test_respects_existing_config(self):
        # conftest already pinned the test cache — the driver-side call
        # must keep it (mixing test compiles into the TPU cache splits
        # both)
        before = jax.config.jax_compilation_cache_dir
        assert before
        assert enable_compilation_cache() == before
        assert jax.config.jax_compilation_cache_dir == before

    def test_cpu_collectives_guard_skips_cache(self, monkeypatch):
        """A CPU-backend run that will execute multi-device collectives
        must NOT get a persistent cache by default (warm XLA:CPU AOT
        reloads of collective programs can deterministically wedge a
        rendezvous — the MULTICHIP_r04 class); the env knob opts back
        in, and an upstream-configured cache is left alone."""
        prev = jax.config.jax_compilation_cache_dir
        # upstream cache present (conftest): left alone even with guard
        assert enable_compilation_cache(cpu_collectives=True) == prev
        try:
            jax.config.update("jax_compilation_cache_dir", None)
            monkeypatch.delenv("MANIPOSE_CPU_COLLECTIVE_CACHE",
                               raising=False)
            assert enable_compilation_cache(cpu_collectives=True) is None
            assert jax.config.jax_compilation_cache_dir is None
            # opt-in restores the old behavior
            monkeypatch.setenv("MANIPOSE_CPU_COLLECTIVE_CACHE", "1")
            assert enable_compilation_cache(cpu_collectives=True)
        finally:
            jax.config.update("jax_compilation_cache_dir", None)
            enable_compilation_cache(prev)

    def test_wants_cpu_collectives_config_mapping(self):
        from manipose_tpu.config import load_config
        from manipose_tpu.drivers.common import wants_cpu_collectives

        assert not wants_cpu_collectives(load_config("config"))
        for ov in (["parallel.data=2"], ["parallel.pipe=2"],
                   ["parallel.model=4"], ["model.attn_impl=ring"]):
            assert wants_cpu_collectives(
                load_config("config", overrides=ov)
            ), ov

    def test_explicit_path_wins_and_populates(self, tmp_path):
        import jax.numpy as jnp

        prev = jax.config.jax_compilation_cache_dir
        try:
            cache = enable_compilation_cache(str(tmp_path / "cc"))
            assert cache == str(tmp_path / "cc")
            # the helper's 1s threshold targets real model graphs; drop
            # it so this toy graph persists
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
            # a fresh (uncached) graph must land in the new directory
            f = jax.jit(lambda x: jnp.tanh(x) @ x.T + 12345.678)
            float(jnp.sum(f(jnp.ones((64, 64)))))
            import os

            assert os.listdir(cache), "cache dir stayed empty"
        finally:
            enable_compilation_cache(prev)
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 0.5
            )  # conftest's value


class TestApplyPlatformEnv:
    """Backend-selection hook for CLI entries (utils/platform.py): the
    ambient sitecustomize merges JAX_PLATFORMS, so every CLI tool must
    route through apply_platform_env() or it initializes the remote TPU
    backend from subprocesses (minutes-long hang when the tunnel is
    down)."""

    def test_noop_without_env(self, monkeypatch):
        from manipose_tpu.utils.platform import apply_platform_env

        monkeypatch.delenv("MANIPOSE_PLATFORM", raising=False)
        monkeypatch.delenv("JAX_PLATFORMS", raising=False)
        assert apply_platform_env() is None

    def test_manipose_platform_wins_and_matches_current(self, monkeypatch):
        from manipose_tpu.utils.platform import apply_platform_env

        # conftest pinned this process to cpu; re-applying the same
        # platform must succeed without touching the live backend
        monkeypatch.setenv("MANIPOSE_PLATFORM", "cpu")
        monkeypatch.setenv("JAX_PLATFORMS", "axon,cpu")
        assert apply_platform_env() == "cpu"
        assert jax.config.jax_platforms == "cpu"

    def test_merged_jax_platforms_is_ignored(self, monkeypatch):
        from manipose_tpu.utils.platform import apply_platform_env

        monkeypatch.delenv("MANIPOSE_PLATFORM", raising=False)
        monkeypatch.setenv("JAX_PLATFORMS", "axon,cpu")
        assert apply_platform_env() is None

    def test_every_jax_cli_entry_calls_the_hook(self):
        """Static guard: any tools/ or scripts/ entry that (transitively)
        initializes JAX must call apply_platform_env(). numpy/torch/
        matplotlib-only tools are exempt."""
        from pathlib import Path

        repo = Path(__file__).resolve().parents[1]
        exempt = {
            "get_table_data.py",       # pandas/numpy only
            "plot_analysis.py",        # matplotlib/numpy only
            "measure_reference_baseline.py",  # reference torch only
            "record_suite.py",         # subprocess-only (pytest child
                                       # pins its own backend in conftest)
        }
        missing = []
        for d in ("tools", "scripts"):
            for f in sorted((repo / d).glob("*.py")):
                if f.name in exempt:
                    continue
                src = f.read_text()
                if "apply_platform_env" not in src:
                    missing.append(f"{d}/{f.name}")
        assert not missing, (
            "CLI entries missing the apply_platform_env() backend hook "
            f"(see utils/platform.py): {missing}"
        )

    def test_record_suite_parses_counts_and_durations(self):
        """record_suite's parser feeds the per-round suite artifact and
        the per-test duration budget (VERDICT r4 Weak #6)."""
        import importlib.util
        from pathlib import Path

        repo = Path(__file__).resolve().parents[1]
        spec = importlib.util.spec_from_file_location(
            "record_suite", repo / "tools" / "record_suite.py"
        )
        rs = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(rs)
        lines = [
            "............\n",
            "=========================== slowest 15 durations "
            "===========================\n",
            "912.31s call     tests/test_e2e.py::test_big\n",
            "45.02s call     tests/test_small.py::test_quick\n",
            "30.00s setup    tests/test_small.py::test_quick\n",
            "402 passed, 16 deselected, 2 skipped in 3254.12s\n",
        ]
        counts, slowest = rs.parse_pytest_output(lines)
        assert counts == {"passed": 402, "deselected": 16, "skipped": 2}
        assert [d["test"] for d in slowest] == [
            "tests/test_e2e.py::test_big",
            "tests/test_small.py::test_quick",
        ]  # setup phase excluded; sorted slowest-first
        assert slowest[0]["s"] == 912.31

    def test_record_suite_from_log_recovers_a_finished_run(self, tmp_path):
        """--from-log writes the suite record from a captured pytest log
        (the r5 path: a green 70-min run whose recording step crashed
        must be recoverable without re-running the suite)."""
        import json
        import os
        import subprocess
        import sys
        from pathlib import Path

        repo = Path(__file__).resolve().parents[1]
        log = tmp_path / "suite.log"
        log.write_text(
            "....\n"
            "=========================== slowest 15 durations "
            "===========================\n"
            "12.00s call     tests/test_a.py::test_x\n"
            "7 passed, 1 skipped in 99.50s\n"
        )
        proc = subprocess.run(
            [sys.executable, str(repo / "tools" / "record_suite.py"),
             "--from-log", str(log), "--rc", "0"],
            capture_output=True, text=True, timeout=120,
            env={**os.environ, "MANIPOSE_SUITE_RECORD_DIR": str(tmp_path),
                 "JAX_PLATFORMS": "cpu"},
            cwd=repo,
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        hist = json.loads(
            (tmp_path / "tools" / "artifacts" / "suite_record.json")
            .read_text()
        )
        rec = hist[-1]
        assert rec["passed"] == 7 and rec["skipped"] == 1
        assert rec["duration_s"] == 99.5  # parsed from the summary line
        assert rec["slowest"][0]["test"] == "tests/test_a.py::test_x"
        assert "recorded from" in rec["cmd"]

    def test_relax_cpu_collective_timeouts_appends_once(self, monkeypatch):
        from manipose_tpu.utils.platform import relax_cpu_collective_timeouts

        monkeypatch.setenv("XLA_FLAGS", "--xla_foo=1")
        import os

        relax_cpu_collective_timeouts(terminate_s=123, warn_s=45)
        flags = os.environ["XLA_FLAGS"]
        assert "--xla_foo=1" in flags
        assert "--xla_cpu_collective_call_terminate_timeout_seconds=123" in flags
        assert "--xla_cpu_collective_call_warn_stuck_timeout_seconds=45" in flags
        # idempotent: a second call must not duplicate or override
        relax_cpu_collective_timeouts(terminate_s=999)
        assert os.environ["XLA_FLAGS"] == flags


class TestTpuCompilerOptions:
    """Per-jit XLA options for the hot train step (utils/platform.py).

    The scoped-VMEM budget was swept on-chip (BASELINE.md round-3 "XLA
    compiler-option sweep"): 32 MiB is a reproducible +1.2% step win,
    so make_train_step applies it whenever the default backend is TPU.
    These tests pin the gating logic; the on-chip effect is recorded in
    BASELINE.md.
    """

    @staticmethod
    def _fake_tpu(monkeypatch):
        """Make the gate see an initialized TPU backend (the gate asks
        jax.default_backend() only when xla_bridge._backends is
        non-empty, so short unit runs — where the lazy backend never
        initialized — must fake both seams)."""
        import jax
        from jax._src import xla_bridge

        monkeypatch.setattr(xla_bridge, "_backends", {"tpu": object()})
        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")

    def test_none_off_tpu(self):
        from manipose_tpu.utils.platform import tpu_compiler_options

        # the suite runs on the CPU backend (conftest pins
        # jax_platforms=cpu), whether or not it initialized yet
        assert tpu_compiler_options() is None

    def test_default_budget_on_tpu(self, monkeypatch):
        from manipose_tpu.utils.platform import tpu_compiler_options

        self._fake_tpu(monkeypatch)
        assert tpu_compiler_options() == {
            "xla_tpu_scoped_vmem_limit_kib": "32768"
        }

    def test_env_override_and_disable(self, monkeypatch):
        from manipose_tpu.utils.platform import tpu_compiler_options

        self._fake_tpu(monkeypatch)
        monkeypatch.setenv("MANIPOSE_XLA_VMEM_KIB", "65536")
        assert tpu_compiler_options() == {
            "xla_tpu_scoped_vmem_limit_kib": "65536"
        }
        monkeypatch.setenv("MANIPOSE_XLA_VMEM_KIB", "0")
        assert tpu_compiler_options() is None

    def test_extra_copts_merge_and_override(self, monkeypatch):
        """MANIPOSE_XLA_COPTS merges arbitrary flag=value pairs on top of
        the built-in budget (the tools/xla_copt_sweep.py wire)."""
        from manipose_tpu.utils.platform import tpu_compiler_options

        self._fake_tpu(monkeypatch)
        monkeypatch.setenv(
            "MANIPOSE_XLA_COPTS",
            " xla_tpu_rwb_fusion=false , xla_tpu_scoped_vmem_limit_kib=1024,"
            "malformed_no_value",
        )
        assert tpu_compiler_options() == {
            "xla_tpu_scoped_vmem_limit_kib": "1024",  # override wins
            "xla_tpu_rwb_fusion": "false",
        }
        # extras alone keep the dict non-None even with the budget off
        monkeypatch.setenv("MANIPOSE_XLA_VMEM_KIB", "0")
        monkeypatch.setenv("MANIPOSE_XLA_COPTS", "xla_tpu_rwb_fusion=false")
        assert tpu_compiler_options() == {"xla_tpu_rwb_fusion": "false"}
        # and everything disabled returns None (no empty-dict jit arg)
        monkeypatch.setenv("MANIPOSE_XLA_COPTS", "")
        assert tpu_compiler_options() is None

    def test_no_backend_init_side_effect(self, monkeypatch):
        """Constructing a train step / Predictor must not initialize the
        JAX backend: before init, the gate reads the jax_platforms
        priority string instead of calling jax.default_backend() (which
        would freeze the platform choice — and hang for minutes when
        the TPU tunnel is down, CLAUDE.md)."""
        import jax
        from jax._src import xla_bridge

        from manipose_tpu.utils.platform import tpu_compiler_options

        monkeypatch.setattr(xla_bridge, "_backends", {})

        def boom():
            raise AssertionError("default_backend() initializes the backend")

        monkeypatch.setattr(jax, "default_backend", boom)
        # the suite pins jax_platforms to cpu (conftest) -> gate closed,
        # and no init happened
        assert (jax.config.jax_platforms or "").split(",")[0] == "cpu"
        assert tpu_compiler_options() is None
        # an axon/tpu-first priority list opens the gate without init
        # (jax_platforms is a read-only property: patch it on the class)
        monkeypatch.setattr(
            type(jax.config),
            "jax_platforms",
            property(lambda self: "axon,cpu"),
        )
        assert tpu_compiler_options() == {
            "xla_tpu_scoped_vmem_limit_kib": "32768"
        }

    def test_train_step_builds_with_gate(self):
        # make_train_step must build (and run) with the gate returning
        # None on this backend — compiler_options=None is a supported
        # jax.jit argument, not a crash.
        import jax.numpy as jnp
        import numpy as np

        from manipose_tpu.geometry import h36m_skeleton_17
        from manipose_tpu.models import ManifoldConfig, RMCLManifoldMixSTE
        from manipose_tpu.train import (
            LossConfig,
            TrainState,
            make_optimizer,
            make_train_step,
        )
        import jax

        skel = h36m_skeleton_17()
        cfg = ManifoldConfig(
            num_frame=9,
            n_hyp=2,
            embed_dim_rot=16,
            depth_rot=1,
            num_heads_rot=2,
            embed_dim_seg=16,
            depth_seg=1,
            num_heads_seg=2,
        )
        model = RMCLManifoldMixSTE(cfg, skel)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(2, 9, 17, 2)).astype(np.float32))
        y = jnp.asarray(
            0.1 * rng.normal(size=(2, 9, 17, 3)).astype(np.float32)
        )
        params = model.init(jax.random.PRNGKey(0), x[:1])
        tx = make_optimizer(weight_decay=1e-6)
        state = TrainState.create(params, tx, jax.random.PRNGKey(1))
        step = make_train_step(
            model.apply, LossConfig(rmcl=True), skel, tx, donate=False
        )
        _, metrics = step(state, x, y, 1e-4)
        assert np.isfinite(float(metrics["loss"]))
