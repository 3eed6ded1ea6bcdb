"""Multi-host (multi-process) execution utilities.

The reference is strictly single-process (SURVEY §2.8: no
``torch.distributed`` anywhere; multi-GPU = in-process
``nn.DataParallel``). Scaling this framework past one TPU host needs
three pieces, all thin wrappers over JAX's native multi-controller
runtime:

1. ``initialize()`` — bring up the JAX distributed service across the
   pod's processes (coordinator discovery from the standard env vars on
   TPU pods; explicit args elsewhere). After this, ``jax.devices()`` is
   GLOBAL and every jit is a pod-wide SPMD program.
2. ``make_hybrid_mesh()`` — a mesh whose outer axis spans hosts (DCN)
   and inner axes stay intra-host (ICI), so the data-parallel gradient
   reduce-scatter rides DCN once per step while TP/FSDP collectives stay
   on ICI (the layout the scaling playbook prescribes).
3. ``global_batch()`` — assemble a pod-global batch from each host's
   process-local shard without any host ever materializing the full
   array (``jax.make_array_from_process_local_data``).

Every function degrades to a no-op / plain single-host behavior when
``jax.process_count() == 1``, which is also how the test suite exercises
this module.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    auto: bool = False,
) -> bool:
    """Initialize the JAX distributed runtime if this looks like a
    multi-process launch; return whether it was initialized.

    Three launch modes:
    - ``auto=True`` (or env ``MANIPOSE_MULTIHOST=1``): argless
      ``jax.distributed.initialize()`` — JAX auto-discovers the
      coordinator from the cluster environment (TPU pod metadata,
      SLURM, ...). Use this on real pods.
    - explicit: all three of coordinator_address / num_processes /
      process_id, via args or the ``JAX_COORDINATOR_ADDRESS`` /
      ``JAX_NUM_PROCESSES`` / ``JAX_PROCESS_ID`` env vars. A partial
      specification is an error (argless auto-discovery won't engage
      and Nones would crash deep inside jax.distributed).
    - neither: single-process run, no-op.
    """
    auto = auto or os.environ.get("MANIPOSE_MULTIHOST", "") == "1"
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    env_np = os.environ.get("JAX_NUM_PROCESSES")
    num_processes = num_processes if num_processes is not None else (
        int(env_np) if env_np else None
    )
    env_pid = os.environ.get("JAX_PROCESS_ID")
    process_id = process_id if process_id is not None else (
        int(env_pid) if env_pid else None
    )
    given = (coordinator_address, num_processes, process_id)
    if auto and all(v is None for v in given):
        # auto-discovery only when nothing explicit was supplied:
        # explicit wiring (args or JAX_* env) always wins over the
        # ambient MANIPOSE_MULTIHOST flag
        jax.distributed.initialize()
        return True
    if all(v is None for v in given):
        return False  # single-process run
    if any(v is None for v in given):
        missing = [
            name for name, v in zip(
                ("coordinator_address", "num_processes", "process_id"),
                given,
            ) if v is None
        ]
        raise ValueError(
            "multi-host launch is partially specified: missing "
            f"{missing}. Provide all three (args or JAX_* env vars), or "
            "use auto=True / MANIPOSE_MULTIHOST=1 for cluster "
            "auto-discovery on TPU pods/SLURM."
        )
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def make_hybrid_mesh(data: int, model: int = 1) -> Mesh:
    """dp x tp mesh laid out so `data` crosses hosts over DCN and
    `model` stays within a host on ICI.

    Single-process: falls back to the plain ICI mesh (identical axis
    names, so calling code is host-count agnostic).
    """
    if jax.process_count() == 1:
        from .mesh import make_mesh

        return make_mesh(data=data, model=model)
    n_proc = jax.process_count()
    assert data % n_proc == 0 and data >= n_proc, (
        f"data axis ({data}) must be a positive multiple of the process "
        f"count ({n_proc}) so each host contributes equal batch shards"
    )
    per_host = data // n_proc
    per_host_devices = jax.local_device_count()
    assert per_host * model == per_host_devices, (
        f"per-host mesh {per_host}x{model} must use exactly the "
        f"{per_host_devices} local devices of each host"
    )
    n_slices = len(
        {getattr(d, "slice_index", 0) for d in jax.devices()}
    )
    if n_slices == n_proc:
        devices = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(per_host, model),
            dcn_mesh_shape=(n_proc, 1),
        )
    else:
        # backends without slice metadata (e.g. multi-process CPU over
        # gloo): group by process — one "slice" per process is exactly
        # the DCN-outer layout create_hybrid_device_mesh would build
        devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
        devices = np.array(devs).reshape(n_proc, per_host, model)
    return Mesh(devices.reshape(data, model), axis_names=("data", "model"))


def global_batch(local_arrays: Sequence[np.ndarray], mesh: Mesh):
    """Assemble pod-global batch-sharded arrays from per-process local
    shards (each host feeds only its slice of the global batch).

    The global batch size is ``local_batch * process_count``. Returns
    jax.Arrays sharded ``P("data")`` over the mesh.
    """
    out = []
    for a in local_arrays:
        a = np.asarray(a)
        sharding = NamedSharding(
            mesh, P("data", *([None] * (a.ndim - 1)))
        )
        out.append(
            jax.make_array_from_process_local_data(sharding, a)
        )
    return tuple(out)


def is_primary() -> bool:
    """True on the process that should write checkpoints/logs."""
    return jax.process_index() == 0


def barrier(name: str, timeout_ms: int = 600_000) -> None:
    """Align all processes at a named point via the coordination service
    (no device collectives involved). No-op single-process.

    Use before the first collective-bearing execution after a long
    uncoordinated stretch (e.g. eager compiles): gloo/ICI context
    initialization gives peers only ~30s to show up, while compile skew
    between processes can be minutes."""
    if jax.process_count() == 1:
        return
    from jax._src import distributed

    distributed.global_state.client.wait_at_barrier(name, timeout_ms)
