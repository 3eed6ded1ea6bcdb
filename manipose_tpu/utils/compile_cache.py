"""Persistent XLA compilation cache for driver entry points.

Full-model graphs compile remotely on this TPU stack in minutes; the
persistent cache turns every driver invocation after the first into a
sub-second cache hit. ``bench.py`` / ``__graft_entry__.py`` already wire
this for themselves — drivers share the SAME default directory so a
bench warm-up also warms the driver (and vice versa).

No reference counterpart (torch caches kernels process-locally); this
is TPU-operational plumbing.
"""

from __future__ import annotations

import os


def _default_cache_dir() -> str:
    """TPU backends share the tunnel cache; anything else gets the
    per-host fingerprinted CPU dir. Mixing XLA:CPU AOT entries into the
    TPU cache dir across host migrations reproduces the MULTICHIP_r03
    poisoning mode (CLAUDE.md cache-hygiene invariant) — previously
    ``MANIPOSE_PLATFORM=cpu python scripts/main_h36m.py`` did exactly
    that through this default."""
    import jax

    from .platform import _on_tpu_backend, cpu_cache_dir

    if _on_tpu_backend(jax):
        return os.path.expanduser("~/.cache/jax-tpu-cache")
    return cpu_cache_dir()


def enable_compilation_cache(
    path: str | None = None, *, cpu_collectives: bool = False
) -> str | None:
    """Point JAX's persistent compilation cache at ``path``.

    Resolution order: explicit ``path`` arg > ``JAX_COMPILATION_CACHE_DIR``
    env var > a platform-keyed default (``~/.cache/jax-tpu-cache`` on
    TPU backends, the per-host fingerprinted CPU dir otherwise — see
    :func:`_default_cache_dir`). Safe to call repeatedly and
    before/after backend init. Returns the directory used, or None when
    the cache is skipped by the collective-wedge guard below.

    ``cpu_collectives=True`` declares that this process will run
    multi-device collectives on a CPU backend (drivers pass it when the
    resolved config requests a >1-device mesh or ring attention). Warm
    XLA:CPU AOT reloads of collective programs are implicated in THREE
    rendezvous wedge modes (VERDICT r3 #1 foreign-entry poisoning; r4
    fresh-cache transient; r4 graded: same-host warm reload
    deterministically desyncing an 8-thread collective-permute — the
    MULTICHIP_r04 killer, reproduced 4/4 warm / 0 cold), so in that
    case the persistent cache is NOT enabled and compiles run cold —
    the same decision the multichip dryrun ships. Opt back in with
    ``MANIPOSE_CPU_COLLECTIVE_CACHE=1`` (or an explicit ``path``); a
    cache already configured upstream (test conftest) is left alone.
    """
    import jax

    already = jax.config.jax_compilation_cache_dir
    if already and not path:
        # something upstream (test conftest, bench.py) picked a cache —
        # keep it rather than splitting compiles across directories
        return already
    from .platform import _on_tpu_backend

    if (
        cpu_collectives
        and not path
        and not _on_tpu_backend(jax)
        and os.environ.get("MANIPOSE_CPU_COLLECTIVE_CACHE") != "1"
    ):
        print(
            "manipose: persistent compile cache DISABLED for this run "
            "(CPU backend + multi-device collectives: warm XLA:CPU AOT "
            "reloads of collective programs can deterministically wedge "
            "a cross-op rendezvous — set MANIPOSE_CPU_COLLECTIVE_CACHE=1 "
            "to re-enable at your own risk)",
            flush=True,
        )
        return None
    cache_dir = (
        path
        or os.environ.get("JAX_COMPILATION_CACHE_DIR")
        or _default_cache_dir()
    )
    os.makedirs(cache_dir, exist_ok=True)
    if already and already != cache_dir:
        # JAX pins its persistent-cache object to the FIRST directory it
        # touches; redirecting the config after any compile is silently
        # ignored without an explicit reset
        from jax.experimental.compilation_cache import compilation_cache

        compilation_cache.reset_cache()
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # default threshold (1 min) would skip most of our graphs; anything
    # that took >=1 s to compile is worth persisting
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return cache_dir
