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
