"""Sweep XLA:TPU per-jit compiler options on the flagship train step.

Client-side XLA_FLAGS never reach this environment's remote TPU
compiler (the tunnel plugin rejects TPU flag names at argv parse), but
per-jit PJRT ``compiler_options`` pass through — this tool sweeps them
empirically on the real chip and appends one JSONL row per variant to
``tools/artifacts/xla_copt_sweep.jsonl``.

Methodology (CLAUDE.md measurement hazards): idle host, chained steps
(each consumes the previous state), completion forced ONCE per rep via
``float(...)`` reductions, best-of-``reps`` (a throughput reading is a
max — transient tunnel noise only degrades a rep). Unknown/rejected
flags are recorded as ``status: rejected`` rather than crashing the
sweep.

Wiring: variants ride the ``MANIPOSE_XLA_VMEM_KIB`` /
``MANIPOSE_XLA_COPTS`` env knobs consumed by
``manipose_tpu.utils.platform.tpu_compiler_options()`` at jit-build
time, i.e. each variant exercises exactly the production code path.

No reference counterpart: the reference has no compiler to tune
(eager torch); this is the TPU analogue of torch.compile mode tuning.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from manipose_tpu.utils.platform import apply_platform_env  # noqa: E402

apply_platform_env()

from manipose_tpu.utils.compile_cache import (  # noqa: E402
    enable_compilation_cache,
)

enable_compilation_cache(None)

import numpy as np  # noqa: E402

BATCH = 16
SEQ_LEN = 243
SMALL = False  # --small: tiny trunk for CPU smoke tests of the harness

# Each variant: (name, vmem_kib — empty keeps the production default
# of 32768 so flag variants stay comparable to the control —, extra
# "k=v,k=v" compiler options).
# The fine scoped-VMEM grid brackets the r3 winner (32768; 65536 was a
# measured -3.5% regression, so the grid stops at 49152); the flag
# variants are plausible single-chip levers — fusion cost models, VMEM
# scavenging, loop-invariant code motion — all safe to probe because a
# rejected name is caught per-variant.
DEFAULT_VARIANTS = [
    ("vmem32768-control", "32768", ""),
    ("vmem24576", "24576", ""),
    ("vmem28672", "28672", ""),
    ("vmem36864", "36864", ""),
    ("vmem40960", "40960", ""),
    ("vmem49152", "49152", ""),
    ("scavenge-vmem", "32768", "xla_tpu_scavenge_vmem_for_fusions=true"),
    (
        "bundle-aware-fusion-cost",
        "32768",
        "xla_tpu_use_bundle_aware_cost_model_for_fusions=true",
    ),
    ("dot-dot-fusion", "32768", "xla_tpu_dot_dot_fusion=true"),
    (
        "nested-loop-fusion-off",
        "32768",
        "xla_tpu_enable_multi_level_nested_loop_fusion=false",
    ),
    ("licm-inflation-2", "32768", "xla_tpu_licm_size_inflation_ratio=2"),
    ("rwb-fusion-off", "32768", "xla_tpu_rwb_fusion=false"),
]


def build_step():
    import jax
    import jax.numpy as jnp

    from manipose_tpu.geometry import h36m_skeleton_17
    from manipose_tpu.models import ManifoldConfig, RMCLManifoldMixSTE
    from manipose_tpu.train import (
        LossConfig,
        TrainState,
        make_optimizer,
        make_train_step,
    )

    skel = h36m_skeleton_17()
    if SMALL:
        cfg = ManifoldConfig(
            num_frame=SEQ_LEN, embed_dim_rot=32, depth_rot=2, num_heads_rot=4,
            embed_dim_seg=16, depth_seg=1, num_heads_seg=4, n_hyp=2,
            drop_path_rate=0.0,
        )
    else:
        cfg = ManifoldConfig(num_frame=SEQ_LEN, n_hyp=5, dtype=jnp.bfloat16)
    model = RMCLManifoldMixSTE(cfg, skel)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(BATCH, SEQ_LEN, 17, 2)).astype(np.float32))
    y = jnp.asarray(
        0.1 * rng.normal(size=(BATCH, SEQ_LEN, 17, 3)).astype(np.float32)
    )
    params = model.init(jax.random.PRNGKey(0), x[:1])
    tx = make_optimizer(weight_decay=1e-6)
    state = TrainState.create(params, tx, jax.random.PRNGKey(1))
    step = make_train_step(
        model.apply, LossConfig(rmcl=True), skel, tx, donate=False
    )
    return step, state, x, y


def time_variant(step, state, x, y, iters: int, reps: int):
    import jax
    import jax.numpy as jnp

    # warm/compile, drained (cold-cache compile must not leak into the
    # timed window — bench.py hazard note)
    s = state
    for _ in range(2):
        s, metrics = step(s, x, y, 4e-5)
        _ = float(metrics["loss"])
    _ = float(jnp.sum(jax.tree_util.tree_leaves(s.params)[0]))
    best_dt = float("inf")
    for _ in range(reps):
        s0 = state
        t0 = time.perf_counter()
        for _ in range(iters):
            s0, metrics = step(s0, x, y, 4e-5)
        _ = float(metrics["loss"])
        _ = float(jnp.sum(jax.tree_util.tree_leaves(s0.params)[0]))
        best_dt = min(best_dt, (time.perf_counter() - t0) / iters)
    return best_dt


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument(
        "--small",
        action="store_true",
        help="tiny trunk + batch (harness smoke test off-TPU)",
    )
    ap.add_argument(
        "--only", nargs="*", default=None, help="variant names to run"
    )
    ap.add_argument(
        "--extra",
        action="append",
        default=[],
        help="ad-hoc variant as NAME:VMEM_KIB:K=V,K=V (may repeat; an "
        "empty VMEM field keeps the production 32768 default so the "
        "flag's effect is measured against the control, not conflated "
        "with removing the budget — pass 0 to explicitly disable it)",
    )
    ap.add_argument(
        "--out",
        default=os.path.join(
            os.path.dirname(__file__), "artifacts", "xla_copt_sweep.jsonl"
        ),
    )
    args = ap.parse_args()
    if args.small:
        global BATCH, SMALL
        BATCH, SMALL = 2, True

    variants = list(DEFAULT_VARIANTS)
    for spec in args.extra:
        parts = spec.split(":", 2) + ["", ""]
        name, vmem, copts = parts[0], parts[1], parts[2]
        variants.append((name, vmem, copts))
    if args.only:
        wanted = set(args.only)
        unknown = wanted - {v[0] for v in variants}
        if unknown:
            ap.error(
                f"unknown variant name(s): {sorted(unknown)}; "
                f"available: {[v[0] for v in variants]}"
            )
        variants = [v for v in variants if v[0] in wanted]

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    results = []
    for name, vmem, copts in variants:
        # empty vmem -> production default (32768), keeping flag
        # variants comparable to the control; "0" disables explicitly
        os.environ["MANIPOSE_XLA_VMEM_KIB"] = vmem or "32768"
        os.environ["MANIPOSE_XLA_COPTS"] = copts or ""
        row = {"variant": name, "vmem_kib": vmem, "copts": copts,
               "batch": BATCH, "seq_len": SEQ_LEN}
        print(f"[copt_sweep] {name}: compiling ...", file=sys.stderr, flush=True)
        t_build = time.perf_counter()
        try:
            step, state, x, y = build_step()
            dt = time_variant(step, state, x, y, args.iters, args.reps)
        except Exception as e:  # noqa: BLE001 — record and continue
            row.update(status="rejected", error=f"{type(e).__name__}: {e}"[:500])
        else:
            row.update(
                status="ok",
                ms_per_step=round(dt * 1e3, 2),
                seq_per_sec=round(BATCH / dt, 2),
                build_s=round(time.perf_counter() - t_build, 1),
            )
        results.append(row)
        with open(args.out, "a") as f:
            f.write(json.dumps(row) + "\n")
        print(f"[copt_sweep] {json.dumps(row)}", file=sys.stderr, flush=True)

    ok = [r for r in results if r.get("status") == "ok"]
    if ok:
        best = min(ok, key=lambda r: r["ms_per_step"])
        print(json.dumps({"best": best}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
