"""Training orchestration: epochs, validation cadence, best-tag
checkpoints, host-side LR scheduling.

Rebuild of ``train()`` (``hpe/main_h36m_lifting.py:212-508``). Reference
semantics kept deliberately:
- both schedulers step once per *validation* epoch (``:400-403``)
- the plateau scheduler is fed ``best_valid_loss`` (monotone), not the
  current loss (``:401``)
- checkpoint tags: best_val, best_mpjpe, best_oracle_mpjpe,
  best_ps_oracle_mpjpe, end; best weights are reloaded at the end
  (``:381-389,440-466,481-489,500-507``)
- MPJPE eval every ``mpjpe_epoch_interval`` epochs on the valid loader.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Callable, Optional

import jax
import numpy as np

from ..data.pipeline import SequenceLoader, prefetch
from ..eval.engine import EvalConfig, evaluate
from ..geometry.skeleton import Skeleton
from ..utils.logging import MetricLogger
from .checkpoint import save_checkpoint
from .losses import LossConfig
from .optim import make_optimizer, make_scheduler
from .profiling import ThroughputMeter, trace
from .step import TrainState, make_eval_loss_step, make_train_step


@dataclasses.dataclass
class TrainResult:
    best_mpjpe: float
    state: TrainState
    best_params: dict
    train_loss: list
    valid_loss: list


def train(
    apply_fn: Callable,
    params,
    cfg,
    skeleton: Skeleton,
    train_loader: SequenceLoader,
    valid_loader: SequenceLoader,
    output_dir,
    rmcl: bool,
    logger: Optional[MetricLogger] = None,
    start_epoch: int = 0,
    save_checkpoints: bool = True,
) -> TrainResult:
    """cfg is the full Config (run/train/... groups)."""
    import json

    from .checkpoint import restore_checkpoint

    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    logger = logger or MetricLogger()
    cfg_train = cfg.train

    if cfg.model.get("mup", False):
        # MuAdam semantics: per-param 1/width_mult LR on matrix-like
        # weights (reference mup.MuAdam, ``main_h36m_lifting.py:228-231``)
        from .mup import make_mup_optimizer

        tx = make_mup_optimizer(
            params,
            width=cfg.model.channels,
            base_width=cfg.model.get("mup_base_width", 64),
            weight_decay=1e-6,
            grad_clip=float(cfg_train.get("grad_clip", 0.0)),
            skip_nonfinite=bool(cfg_train.get("skip_nonfinite", False)),
        )
    else:
        tx = make_optimizer(
            weight_decay=1e-6,
            grad_clip=float(cfg_train.get("grad_clip", 0.0)),
            skip_nonfinite=bool(cfg_train.get("skip_nonfinite", False)),
        )

    # optional multi-chip training: cfg.parallel = {data, model, mode}.
    # The reference's analogue is nn.DataParallel when >1 GPU
    # (``main_h36m_lifting.py:747-753``); here params are laid out on a
    # dp x tp mesh (mode="fsdp" additionally ZeRO-3-shards them over the
    # data axis) and per-batch placement shards the batch dimension —
    # XLA inserts every collective.
    mesh = None
    shard_batch = None
    pcfg = cfg.get("parallel") or {}
    n_data = int(pcfg.get("data", 1))
    n_model = int(pcfg.get("model", 1))
    n_pipe = int(pcfg.get("pipe", 1))
    if n_data * n_model * n_pipe > 1:
        from ..parallel import make_mesh, shard_batch, shard_params

        mesh = make_mesh(data=n_data, model=n_model, pipe=n_pipe)
        # every batch that reaches _place (train AND validation/eval)
        # must split evenly over the data axis
        for name, bs in (
            ("train.batch_size", cfg_train.batch_size),
            ("train.batch_size_test", cfg_train.get("batch_size_test",
                                                    cfg_train.batch_size)),
        ):
            assert bs % mesh.shape["data"] == 0, (
                f"{name}={bs} must divide over the data mesh axis "
                f"({mesh.shape['data']})"
            )
        mode = pcfg.get("mode", "tp")
        if cfg.model.get("attn_impl", "xla") == "ring" or n_pipe > 1:
            # ring repurposes the 'model' axis for the SEQUENCE and the
            # pipe mesh has no 'model' axis at all — either way the TP
            # matmul rules must not apply; params stay whole (dp) or
            # ZeRO-3-shard over 'data' only
            mode = {"tp": "dp", "fsdp": "fsdp_dp"}.get(mode, mode)
        params = shard_params(params, mesh, mode=mode)
        print(f"==> Training on mesh {dict(mesh.shape)}, mode={mode}")

    def _place(*arrays):
        if mesh is not None:
            # device_put shards host numpy straight to the P('data')
            # layout — one transfer, no default-device staging hop
            return shard_batch(arrays, mesh)
        return tuple(jax.numpy.asarray(a) for a in arrays)

    state = TrainState.create(params, tx, jax.random.PRNGKey(cfg.run.seed))
    scheduler = make_scheduler(
        cfg_train.lr_scheduler,
        base_lr=cfg_train.lr,
        epochs=cfg_train.epochs,
        n_annealing=cfg_train.n_annealing,
        lr_min=cfg_train.lr_min,
        lr_patience=cfg_train.lr_patience,
        lr_threshold=cfg_train.lr_threshold,
    )

    # resume optimizer + scheduler + epoch (reference run.checkpoint_params,
    # ``main_h36m_lifting.py:225,239-241,267-269,283-285``)
    from .checkpoint import find_resume_state

    resume_from = cfg.run.get("checkpoint_params", "")
    if not resume_from and cfg.run.get("auto_resume", False):
        # elastic restart: relaunching the SAME command after a
        # preemption picks up this run's own latest COMMITTED resume
        # state — find_resume_state skips torn mid-commit dirs
        # (no reference counterpart — its resume is manual only)
        if find_resume_state(output_dir) is not None:
            resume_from = str(output_dir)
            print(f"==> auto_resume: found train state in {output_dir}")
    if resume_from:
        resume_dir = Path(resume_from)
        found = find_resume_state(resume_dir)
        if found is None:
            raise FileNotFoundError(
                f"no committed resume state under {resume_dir} "
                "(expected train_state_NNNNNN/ with host_state.json, or "
                "the legacy train_state/ layout)"
            )
        tag, host = found
        state = restore_checkpoint(resume_dir, tag, state)
        scheduler.load_state_dict(host["scheduler"])
        start_epoch = host["epoch"]
        print(
            f"Resumed training state from {resume_dir}/{tag} "
            f"@ epoch {start_epoch}"
        )

    loss_cfg = LossConfig(
        sq_loss=cfg_train.sq_loss,
        w_loss=cfg_train.w_loss,
        vel_loss=cfg_train.vel_loss,
        smooth_reg=cfg_train.smooth_reg,
        rmcl_score_reg=cfg_train.rmcl_score_reg,
        rigid_seg_reg=cfg_train.rigid_seg_reg,
        rmcl=rmcl,
    )
    train_step = make_train_step(apply_fn, loss_cfg, skeleton, tx, donate=False)
    # megastep: fuse K optimizer steps into one compiled call
    # (lax.scan over stacked batches) — one host dispatch per K steps.
    # Single-device only: under a mesh the stacked (K, B, ...) layout
    # would need batch sharding on axis 1, which shard_batch doesn't lay
    # out (and the mesh path's dispatch already overlaps collectives).
    steps_per_call = int(cfg_train.get("steps_per_call", 1))
    multi_step = None
    if steps_per_call > 1:
        if mesh is not None:
            print(
                "WARNING: train.steps_per_call > 1 is single-device only "
                "(stacked batches are not mesh-sharded); megastep "
                "DISABLED for this mesh run"
            )
        else:
            from .step import make_multi_train_step

            multi_step = make_multi_train_step(
                apply_fn, loss_cfg, skeleton, tx, steps_per_call,
                donate=False,
            )
            print(
                f"==> Megastep: {steps_per_call} optimizer steps per dispatch"
            )
    val_step = make_eval_loss_step(apply_fn, loss_cfg, skeleton)
    eval_cfg = EvalConfig(tta=cfg_train.tta, rmcl=rmcl, compute_oracle=rmcl)

    best_valid_loss = 1e10
    best_mpjpe = 1e10
    best_oracle = 1e10
    best_psoracle = 1e10
    # None until a validation/eval epoch fires: if none ever does (e.g.
    # epochs < valid_epoch_interval), fall back to the FINAL params —
    # silently returning the initial weights would poison the test
    # protocol downstream
    best_params = None
    train_loss_hist, valid_loss_hist = [], []

    def _ckpt(current_state, tag):
        if not save_checkpoints:
            return
        # async save: device arrays go straight to orbax, which stages
        # and commits in the background while training continues (the
        # train step never mutates these buffers — updates are
        # functional and the step doesn't donate)
        save_checkpoint(output_dir, tag, current_state.params)

    def _save_resume_state(current_state, epoch):
        """Full train state for resume (reference params{tag}.pth:
        optimizer + scheduler + epoch, ``main_h36m_lifting.py:89-95``).
        Call AFTER the epoch's scheduler step: ``epoch`` is the restart
        point, so the saved scheduler must already include this epoch's
        step (saving pre-step would permanently drop one step on
        resume and desync the LR schedule).

        Crash-consistent (see ``checkpoint.find_resume_state``): each
        save commits under an epoch-numbered tag so it never deletes the
        previous committed state, and the host sidecar is written INSIDE
        the committed dir only after the blocking save returns — a kill
        at ANY point leaves either the new state fully committed+marked
        or the previous one as the newest committed+marked, never a
        restorable-looking torn state. The un-numbered pointer json is
        kept as a convenience/back-compat breadcrumb only.
        """
        if not save_checkpoints:
            return
        from .checkpoint import atomic_write_json, prune_resume_states

        tag = f"train_state_{epoch:06d}"
        save_checkpoint(output_dir, tag, current_state, block=True)
        host = {"scheduler": scheduler.state_dict(), "epoch": epoch,
                "tag": tag}
        # sidecar after commit = the "fully committed" marker; safe to
        # write inside because numbered tags are never re-renamed
        atomic_write_json(output_dir / tag / "host_state.json", host)
        atomic_write_json(output_dir / "train_state_host.json", host)
        prune_resume_states(output_dir, keep=2)

    with trace(cfg.run.get("profile_dir", "")):
        for epoch in range(start_epoch, cfg_train.epochs):
            # per-epoch throughput (training batches only)
            meter = ThroughputMeter()
            train_loader.set_epoch(epoch)
            # --- train epoch ---
            term_sums: dict = {}
            pending: list = []  # buffered full batches for the megastep

            def _record(metrics, n_steps=1):
                for k, v in metrics.items():
                    sums = term_sums.setdefault(k, [])
                    if n_steps == 1:
                        sums.append(v)
                    else:  # stacked (n_steps,) device array
                        sums.extend(v[i] for i in range(n_steps))

            def _flush_pending():
                nonlocal state
                if not pending:
                    return
                # meter at DISPATCH time, once per flush: the meter's
                # first-call exclusion then keeps the megastep compile
                # out of the timed window (stepping it at buffer time
                # would start the clock before the compiling dispatch)
                meter.step(sum(b.shape[0] for b, _ in pending))
                if len(pending) == steps_per_call:
                    xs, ys = _place(
                        np.stack([b[0] for b in pending]),
                        np.stack([b[1] for b in pending]),
                    )
                    state, metrics = multi_step(state, xs, ys, scheduler.lr)
                    _record(metrics, n_steps=len(pending))
                else:  # epoch-end remainder: regular single steps
                    for x2d, x3d in pending:
                        x2d, x3d = _place(x2d, x3d)
                        state, metrics = train_step(
                            state, x2d, x3d, scheduler.lr, None
                        )
                        _record(metrics)
                pending.clear()

            for batch in prefetch(train_loader):
                n_valid = int(batch.valid.sum())
                if multi_step is not None and n_valid == batch.batch_size:
                    pending.append((batch.pose_2d, batch.pose_3d))
                    if len(pending) == steps_per_call:
                        _flush_pending()
                    continue
                # a partial batch must run AFTER the buffered full ones
                # (data order == optimizer-step order)
                _flush_pending()
                meter.step(n_valid)
                x2d, x3d = _place(batch.pose_2d, batch.pose_3d)
                # under a mesh, keep the full (padded) batch so the
                # per-device shard shapes stay static: the final partial
                # batch's replicate-padding rows (duplicates of real
                # windows) then contribute to the loss once per epoch —
                # a mild reweighting the single-device n_valid slicing
                # avoids
                n_valid_arg = (
                    n_valid
                    if mesh is None and n_valid < batch.batch_size
                    else None
                )
                state, metrics = train_step(
                    state, x2d, x3d, scheduler.lr, n_valid_arg
                )
                _record(metrics)
            _flush_pending()
            epoch_loss = float(
                np.mean([float(x) for x in term_sums["loss"]])
            )
            train_loss_hist.append(epoch_loss)
            metrics_to_log = {
                "tr_loss": epoch_loss,
                "lr": scheduler.lr,
                "seq_per_sec": meter.seq_per_sec,
            }
            for k, vals in term_sums.items():
                if k != "loss":
                    metrics_to_log[k] = float(np.mean([float(x) for x in vals]))

            # --- validation loss ---
            if (epoch + 1) % cfg_train.valid_epoch_interval == 0:
                val_losses = []
                for batch in prefetch(valid_loader):
                    vx2d, vx3d = _place(batch.pose_2d, batch.pose_3d)
                    # mirror the train path: under a mesh keep the full
                    # padded batch (static shard shapes, one compiled
                    # graph) instead of slicing to n_valid — an uneven
                    # slice of a sharded batch forces resharding
                    # collectives plus a per-size retrace
                    n_valid_val = (
                        batch.batch_size
                        if mesh is not None
                        else int(batch.valid.sum())
                    )
                    m = val_step(state.params, vx2d, vx3d, n_valid_val)
                    # device scalar; float()ing here would sync per batch
                    val_losses.append(m["loss"])
                epoch_val = (
                    float(np.mean([float(x) for x in val_losses]))
                    if val_losses
                    else np.inf
                )
                valid_loss_hist.append(epoch_val)
                metrics_to_log["val_loss"] = epoch_val

                improved = best_valid_loss > epoch_val
                if improved:
                    best_valid_loss = epoch_val
                    _ckpt(state, "best_val")
                    best_params = state.params
                    metrics_to_log.update(
                        {"best_epoch_loss": epoch, "best_val_loss": epoch_val}
                    )
                # reference steps the scheduler only on validation epochs and
                # feeds plateau the best loss (``:400-403``)
                scheduler.step(best_valid_loss)
                if improved:
                    _save_resume_state(state, epoch + 1)

            # --- MPJPE eval ---
            if (epoch + 1) % cfg_train.mpjpe_epoch_interval == 0:
                results = evaluate(
                    apply_fn, state.params, valid_loader, skeleton, eval_cfg
                )
                mpjpe_val = results[2]
                metrics_to_log["val_mpjpe"] = mpjpe_val
                if rmcl:
                    oracle_val, psoracle_val = results[3], results[4]
                    metrics_to_log["val_oracle_mpjpe"] = oracle_val
                    metrics_to_log["val_ps_oracle_mpjpe"] = psoracle_val
                    if best_oracle > oracle_val:
                        best_oracle = oracle_val
                        _ckpt(state, "best_oracle_mpjpe")
                        metrics_to_log.update(
                            {
                                "best_epoch_oracle_mpjpe": epoch,
                                "best_val_oracle_mpjpe": oracle_val,
                            }
                        )
                    if best_psoracle > psoracle_val:
                        best_psoracle = psoracle_val
                        _ckpt(state, "best_ps_oracle_mpjpe")
                        metrics_to_log.update(
                            {
                                "best_epoch_ps_oracle_mpjpe": epoch,
                                "best_val_ps_oracle_mpjpe": psoracle_val,
                            }
                        )
                if best_mpjpe > mpjpe_val:
                    best_mpjpe = mpjpe_val
                    _ckpt(state, "best_mpjpe")
                    best_params = state.params
                    metrics_to_log.update(
                        {"best_epoch_mpjpe": epoch, "best_val_mpjpe": best_mpjpe}
                    )

            logger.log(metrics_to_log, step=epoch)


    _ckpt(state, "end")
    _save_resume_state(state, cfg_train.epochs)
    if save_checkpoints:
        from .checkpoint import wait_for_checkpoints

        wait_for_checkpoints()  # all async writes committed before return
    np.save(output_dir / "train_loss.npy", np.asarray(train_loss_hist))
    np.save(output_dir / "valid_loss.npy", np.asarray(valid_loss_hist))
    if best_params is None:
        print(
            "WARNING: no validation/eval epoch fired "
            f"(epochs={cfg_train.epochs}, valid_epoch_interval="
            f"{cfg_train.valid_epoch_interval}); returning FINAL params"
        )
        best_params = state.params
    # reload best weights (``:507``)
    state = state.replace(params=best_params)
    return TrainResult(
        best_mpjpe=best_mpjpe,
        state=state,
        best_params=best_params,
        train_loss=train_loss_hist,
        valid_loss=valid_loss_hist,
    )
