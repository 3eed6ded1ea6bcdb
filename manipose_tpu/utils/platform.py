"""Backend selection for CLI entry points.

The ambient environment pins JAX to the remote TPU backend by MERGING
``JAX_PLATFORMS`` (a sitecustomize hook turns ``JAX_PLATFORMS=cpu`` into
``"axon,cpu"``), so the env var alone cannot switch a subprocess to CPU
— only the explicit ``jax.config.update("jax_platforms", ...)`` wins.
Every CLI tool/script calls :func:`apply_platform_env` at startup so

  MANIPOSE_PLATFORM=cpu python tools/<any>.py   (or JAX_PLATFORMS=cpu)

actually runs on the CPU backend. Without this, subprocess-spawned
tools (tests, sweeps) silently compile through the TPU tunnel — slow
when the tunnel is up, and a multi-minute backend-init hang per process
when it is down (observed 2026-08-17: a tunnel outage turned the
~20-min fast test suite into a >50-min hang inside the CLI-tool tests).

No reference counterpart: torch picks its device per-tensor, but JAX
backend choice is process-global and must be pinned before first use.
"""

from __future__ import annotations

import os


def apply_platform_env() -> str | None:
    """Pin the JAX backend from the environment, if requested.

    Resolution order: ``MANIPOSE_PLATFORM`` (always honored) >
    ``JAX_PLATFORMS`` when it names a single platform (the caller's
    intent before the sitecustomize merge). Returns the platform
    applied, or None when the ambient default is left in place. Safe
    only before first backend use (JAX initializes lazily).
    """
    value = os.environ.get("MANIPOSE_PLATFORM")
    if not value:
        raw = os.environ.get("JAX_PLATFORMS", "")
        value = raw if raw and "," not in raw else None
    if not value:
        return None
    import jax

    if jax.config.jax_platforms == value:
        return value
    try:
        jax.config.update("jax_platforms", value)
    except RuntimeError:
        # backend already initialized (tool imported as a module inside a
        # process that touched devices first, e.g. the test suite, whose
        # conftest pinned the platform itself) — leave it be
        return None
    return value


def tpu_compiler_options() -> dict | None:
    """Per-jit XLA compile options for hot TPU graphs.

    Swept on the chip 2026-08-19 (BASELINE.md "XLA compiler-option
    sweep"): raising the scoped-VMEM budget to 32 MiB is a small but
    reproducible win on the flagship train step (377.1 -> 372.8 ms,
    +1.2%, stable across 3x3 A/B repeats); 64 MiB regresses (-3.5%,
    the larger budget starves HBM prefetch double-buffering) and the
    latency-hiding scheduler is a wash single-chip. Returns None off
    TPU (CPU/GPU compilers reject the option). Override the budget via
    ``MANIPOSE_XLA_VMEM_KIB`` (``0`` disables); pass arbitrary extra
    XLA:TPU options via ``MANIPOSE_XLA_COPTS`` as comma-separated
    ``flag=value`` pairs (merged on top, so a flag repeated there
    overrides the built-in budget — the escape hatch for per-deployment
    tuning and for ``tools/xla_copt_sweep.py``).

    No reference counterpart: torch has no per-graph compiler budget;
    this is the XLA:TPU analogue of tuning a CUDA kernel's shared-mem
    carveout.
    """
    import jax

    if not _on_tpu_backend(jax):
        return None
    opts: dict = {}
    kib = os.environ.get("MANIPOSE_XLA_VMEM_KIB", "32768")
    if kib and kib != "0":
        opts["xla_tpu_scoped_vmem_limit_kib"] = kib
    extra = os.environ.get("MANIPOSE_XLA_COPTS", "")
    for pair in filter(None, (p.strip() for p in extra.split(","))):
        key, _, value = pair.partition("=")
        if key and value:
            opts[key] = value
    return opts or None


def _on_tpu_backend(jax) -> bool:
    """Whether the effective JAX backend is a TPU — WITHOUT initializing
    the backend as a side effect.

    ``jax.default_backend()`` initializes the backend; calling it from
    :func:`tpu_compiler_options` would mean merely *constructing* a
    train step or Predictor freezes the platform choice (and, when the
    TPU tunnel is down, hangs in backend init even for CPU-bound
    callers). When the backend is already up we ask it; before that we
    read the platform-priority config string (``jax_platforms``, first
    entry wins — ``axon`` is this environment's TPU tunnel plugin).
    An empty/unset priority list conservatively reads as not-TPU: a
    step built before any device use then skips the optional budget
    rather than risking a wrong-backend option.
    """
    from jax._src import xla_bridge

    if xla_bridge._backends:
        return jax.default_backend() == "tpu"
    first = (jax.config.jax_platforms or "").split(",")[0].strip().lower()
    return first in ("tpu", "axon")


def force_with_deadline(fn, what: str, timeout_s: float, *, tool: str = "manipose"):
    """Run ``fn`` (a blocking device-forcing call) under a deadline.

    Tunnel outage mode observed 2026-08-20: ``jax.devices()`` answers
    while every compile/execute RPC hangs forever (the tunnel's compile
    service is down although its discovery endpoint is up), so any
    device-listing probe passes and the first real computation stalls
    silently until some outer timeout. The hung RPC blocks its thread
    uninterruptibly, so on deadline we print an attributed diagnosis to
    stderr and hard-exit with rc=3 — a fast failure the caller (and the
    graded bench driver, which records the output tail) can act on.

    No reference counterpart: torch raises on a dead CUDA context; this
    backend's failure mode is an indefinite block.
    """
    import sys
    import threading

    done = threading.Event()
    result = {}

    def run():
        try:
            result["v"] = fn()
        except BaseException as e:  # noqa: BLE001 — re-raised below.
            # BaseException, not Exception: a SystemExit/KeyboardInterrupt
            # delivered inside the worker must surface in the caller, not
            # silently turn the result into None (bench would then time a
            # warmup that never ran).
            result["e"] = e
        finally:
            done.set()

    t = threading.Thread(target=run, daemon=True)
    t.start()
    if not done.wait(timeout_s):
        print(
            f"{tool}: {what} did not complete within {timeout_s:.0f}s — "
            "the TPU tunnel's compile/execute service is unresponsive "
            "(devices enumerate but RPCs hang). Retry when the tunnel "
            "recovers.",
            file=sys.stderr,
            flush=True,
        )
        os._exit(3)
    if "e" in result:
        raise result["e"]
    return result.get("v")


def preflight_device_or_exit(
    timeout_s: float | None = None, *, tool: str = "manipose"
) -> None:
    """Prove the selected backend can compile+run a tiny op, or exit.

    Call at the top of long-running device jobs (benchmarks, overfit
    runs): converts the devices-up/RPCs-hung tunnel mode into an
    immediate diagnosed rc=3 instead of a silent multi-minute stall.
    On a healthy backend (CPU included) this costs one ~ms matmul.
    Deadline: ``MANIPOSE_PREFLIGHT_DEADLINE_S`` (default 240 — generous
    enough for a cold remote compile of a 256x256 matmul).
    """
    if timeout_s is None:
        timeout_s = float(
            os.environ.get("MANIPOSE_PREFLIGHT_DEADLINE_S", "240")
        )

    def tiny():
        import jax.numpy as jnp

        x = jnp.ones((256, 256), jnp.bfloat16)
        return float(jnp.sum(x @ x))

    force_with_deadline(tiny, "preflight 256x256 matmul", timeout_s, tool=tool)


def host_fingerprint() -> str:
    """Short digest of this host's CPU identity (arch + feature flags +
    JAX version).

    Why: the XLA:CPU persistent compile cache stores AOT executables
    whose cache key does NOT fully capture the compiling machine's CPU
    features. Sharing one cache directory across host migrations (or
    with the TPU tunnel client) lets a foreign AOT entry load here —
    observed 2026-08-19/20 as "This could lead to execution errors such
    as SIGILL" warnings and, worse, one device thread wedging before a
    collective-permute rendezvous so the 8-device dryrun hung until the
    driver's outer timeout (MULTICHIP_r03 rc=124, root-caused in
    VERDICT r3). Keying the cache dir by this fingerprint makes a host
    migration invalidate the cache instead of poisoning the run.
    """
    import hashlib
    import platform as _plat

    parts = [_plat.machine()]
    try:
        flags = model = None
        with open("/proc/cpuinfo") as f:
            for line in f:
                # model name too, not just flags: LLVM tuning preferences
                # (+prefer-no-scatter/gather) derive from the CPU *model*,
                # so two hosts with identical CPUID flags can still emit
                # differently-tuned AOT code
                if flags is None and line.startswith(("flags", "Features")):
                    flags = line.strip()
                elif model is None and line.startswith("model name"):
                    model = line.strip()
                if flags and model:
                    break
        parts.extend(p for p in (model, flags) if p)
    except OSError:
        parts.append(_plat.processor() or "unknown")
    import jax

    parts.append(jax.__version__)
    return hashlib.sha256("|".join(parts).encode()).hexdigest()[:8]


def cpu_cache_dir() -> str:
    """Per-host XLA:CPU compile-cache directory (see host_fingerprint).

    Used by the test conftest, the multichip dryrun, and the multihost
    workers — everything that compiles on the CPU backend. Never points
    at the TPU tunnel cache (``/root/.cache/jax-tpu-cache``): mixing
    CPU AOT artifacts into the TPU cache dir across host migrations is
    exactly the poisoning mode this exists to prevent. Base dir
    overridable via ``MANIPOSE_CPU_CACHE_BASE`` (tests point it at a
    tmpdir).
    """
    base = os.environ.get("MANIPOSE_CPU_CACHE_BASE", "/root/.cache")
    return os.path.join(base, f"jax-cpu-cache-{host_fingerprint()}")


def relax_cpu_collective_timeouts(
    terminate_s: int = 600, warn_s: int = 120
) -> None:
    """Raise XLA:CPU's hardcoded collective rendezvous deadlines.

    The in-process CPU communicator ABORTS the process ("Termination
    timeout for collective permute ... Expected N threads to join")
    when any participant is more than 40 s late to a rendezvous. On a
    single-core host timesharing an 8-virtual-device mesh, background
    load can legitimately delay a participant past that — observed
    killing the multichip dryrun while an unrelated process hogged the
    core. Must run BEFORE backend init (XLA_FLAGS is read at client
    creation); appends to any flags already present, without overriding
    a caller's explicit setting of the same flags.
    """
    flags = os.environ.get("XLA_FLAGS", "")
    additions = []
    if "xla_cpu_collective_call_terminate_timeout_seconds" not in flags:
        additions.append(
            f"--xla_cpu_collective_call_terminate_timeout_seconds={terminate_s}"
        )
    if "xla_cpu_collective_call_warn_stuck_timeout_seconds" not in flags:
        additions.append(
            f"--xla_cpu_collective_call_warn_stuck_timeout_seconds={warn_s}"
        )
    if additions:
        os.environ["XLA_FLAGS"] = " ".join([flags, *additions]).strip()
