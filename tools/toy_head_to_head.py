"""Trained-model parity: reference torch toy experiments vs manipose_tpu
on IDENTICAL data.

Reproduces the paper's Table 1 (hard-2 circle) and Table 6 (torus 2D->3D)
protocols (``toy_experiment/quantitative_comparison_toy{2d,3d}.sh``,
``toy_experiment/main.py:246-318``) by training BOTH the reference's own
PyTorch code (imported read-only from /root/reference) and this framework
on the same sampled arrays and seeds, then scoring each side with its own
metric implementations. This is the strongest trained-model parity
evidence obtainable in this environment (no H36M/3DHP data, zero egress).

Data provenance:
  - circle (hard-2): sampled with the *reference's* HardBimodalDist
    (numpy-only), fed to both sides.
  - torus: the reference samples via pyro's SineBivariateVonMises
    (``data/distributions.py:3``) which is not installed here; we sample
    with this repo's sine-bivariate von Mises implementation and feed the
    SAME arrays to both sides — the training/eval paths stay 100% theirs.

Usage:
  python tools/toy_head_to_head.py [--seeds 42 43 44 45 46]
      [--scenarios hard-2 torus] [--epochs-override N] [--json PATH]
"""

from __future__ import annotations

import argparse
import contextlib
import json
import random
import sys
import tempfile
import types
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
REF_TOY = "/root/reference/toy_experiment"

sys.path.insert(0, str(REPO))

from manipose_tpu.utils.platform import apply_platform_env  # noqa: E402

apply_platform_env()


# ---------------------------------------------------------------------------
# Reference import scaffolding: stub undeclared/absent third-party deps so
# the reference's own modules import unchanged (mlflow, omegaconf, pyro).
# ---------------------------------------------------------------------------
def _stub_module(name: str, **attrs) -> types.ModuleType:
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules.setdefault(name, mod)
    return sys.modules[name]


def install_reference_toy():
    """Import the reference toy packages (read-only) and return them."""
    if "mlflow" not in sys.modules:
        def _noop(*a, **k):
            return None

        mlf = types.ModuleType("mlflow")
        mlf.log_metric = _noop
        mlf.log_metrics = _noop
        mlf.log_param = _noop
        mlf.log_artifact = _noop
        mlf.set_tracking_uri = _noop
        mlf.set_experiment = _noop
        mlf.start_run = contextlib.nullcontext
        sys.modules["mlflow"] = mlf

    if "omegaconf" not in sys.modules:
        class DictConfig(dict):
            pass

        class ListConfig(list):
            pass

        _stub_module("omegaconf", DictConfig=DictConfig, ListConfig=ListConfig,
                     OmegaConf=types.SimpleNamespace(to_yaml=str))

    if "pyro" not in sys.modules:
        class SineBivariateVonMises:  # only needed for torus *sampling*
            def __init__(self, *a, **k):
                raise RuntimeError(
                    "pyro is not installed; torus data must be passed in "
                    "as arrays (see sample_torus)."
                )

        pyro = _stub_module("pyro")
        dist = _stub_module("pyro.distributions")
        sbvm = _stub_module(
            "pyro.distributions.sine_bivariate_von_mises",
            SineBivariateVonMises=SineBivariateVonMises,
        )
        pyro.distributions = dist
        dist.sine_bivariate_von_mises = sbvm
        dist.SineBivariateVonMises = SineBivariateVonMises

    if REF_TOY not in sys.path:
        sys.path.insert(0, REF_TOY)

    import data as ref_data  # noqa: F401  (reference toy packages)
    import models as ref_models
    import training as ref_training

    # Reference bug workaround (runtime patch; files stay untouched):
    # constrained_mlp_rmcl.py defines _l2_loss_per_hyp TWICE — the 2D
    # version at :246-253 is shadowed by the torus version at :250-259
    # which slices [..., :3], so the published code CRASHES on
    # `model.arch=constrained_rmcl data.scenario=hard-2` (the Table 1
    # ManiPose row). Restore the intended semantics by dispatching the
    # hypothesis slice on the target dimensionality.
    import torch as _torch

    rmcl_mod = sys.modules["models.constrained_mlp_rmcl"]

    def _l2_loss_per_hyp(hypothesis, y):
        d = y.shape[-1]
        pred = hypothesis[..., :d]
        return _torch.mean(
            (pred - y[:, None, :].expand_as(pred)) ** 2, dim=2
        )

    rmcl_mod._l2_loss_per_hyp = _l2_loss_per_hyp

    return ref_data, ref_models, ref_training


class _AttrDict(dict):
    """Minimal DictConfig stand-in: attribute access + `in`."""

    __getattr__ = dict.__getitem__


# ---------------------------------------------------------------------------
# Shared data sampling (identical arrays for both sides)
# ---------------------------------------------------------------------------
def sample_circle(seed: int, n=(1000, 1000, 1000)):
    """hard-2 circle data via the reference's own distribution
    (``data/scenarios.py`` HardBimodalDist, numpy-only)."""
    ref_data, _, _ = install_reference_toy()
    dist = ref_data.HardBimodalDist(radius=1.0, random_state=seed)
    splits = [dist.sample(k) for k in n]  # train, val, test — same order
    return [
        (x[:, None].astype(np.float32), y.astype(np.float32))
        for x, y in splits
    ]


def sample_torus(seed: int, n=(20000, 2000, 2000)):
    """torus-2Dto3D data via this repo's sine-bivariate von Mises (the
    reference's sampler needs pyro; arrays are shared verbatim)."""
    from manipose_tpu.toy import torus_scenario

    dist = torus_scenario(2.0, 1.0, random_state=seed)
    splits = [dist.sample(k) for k in n]
    return [(x.astype(np.float32), y.astype(np.float32)) for x, y in splits]


# ---------------------------------------------------------------------------
# Reference side (torch, their Trainer / models / metrics)
# ---------------------------------------------------------------------------
def run_reference(scenario: str, arch: str, seed: int, splits, epochs=None):
    import torch
    import torch.nn.functional as F
    from torch import nn
    from torch.utils.data import DataLoader, TensorDataset

    _, ref_models, ref_training = install_reference_toy()

    torch.manual_seed(seed)
    np.random.seed(seed)
    random.seed(seed)

    (x_tr, y_tr), (x_va, y_va), (x_te, y_te) = splits
    train_set = TensorDataset(torch.from_numpy(x_tr), torch.from_numpy(y_tr))
    val_set = TensorDataset(torch.from_numpy(x_va), torch.from_numpy(y_va))
    test_set = TensorDataset(torch.from_numpy(x_te), torch.from_numpy(y_te))

    act = nn.Tanh
    if scenario == "hard-2":
        lr, bs, n_epochs = 1e-2, 100, epochs or 50
        cfg_data = _AttrDict(scenario="hard-2", radius=1)
        if arch == "mlp":
            model = ref_models.Mlp(1, 32, 2, n_layers=2, act_layer=act)
        elif arch == "constrained":
            model = ref_models.ConstrainedMlp(
                in_features=1, hidden_features=32, out_features=1,
                n_layers=2, act_layer=act, radius=1.0,
            )
        elif arch == "constrained_rmcl":
            model = ref_models.ConstrainedMlpRmcl(
                in_features=1, hidden_features=32, out_features=1,
                n_layers=2, act_layer=act, radius=1.0, n_hyp=5, beta=0.1,
            )
        else:  # diffusion baseline (conf/train/diff_hard2.yaml)
            lr, bs, n_epochs = 1e-3, 100, epochs or 200
            diff_cfg = _AttrDict(
                diffusion=_AttrDict(
                    conditioning="raw", cond_mix_mode="concat",
                    beta_start=0.0001, beta_end=0.5, num_steps=50,
                    schedule="cosine",
                ),
                model=_AttrDict(arch="mlp", hidden_features=32, layers=2),
                multi_hyp=_AttrDict(nsamples=5, agg_strategy="average"),
            )
            model = ref_models.LiftingDiffusionModel(
                config=diff_cfg, act=act, device="cpu"
            )
    else:  # torus
        lr, bs, n_epochs = 1e-3, 1000, epochs or 50
        cfg_data = _AttrDict(
            scenario="torus-2Dto3D", major_radius=2, minor_radius=1
        )
        if arch == "mlp":
            model = ref_models.Mlp(2, 32, 6, n_layers=2, act_layer=act)
        elif arch == "constrained":
            model = ref_models.ConstrainedMlpV2(
                in_features=2, hidden_features=32, out_features=2,
                n_layers=2, act_layer=act, major_radius=2.0, minor_radius=1.0,
            )
        else:
            model = ref_models.ConstrainedMlpRmclV2(
                in_features=2, hidden_features=32, out_features=2,
                n_layers=2, act_layer=act, major_radius=2.0,
                minor_radius=1.0, n_hyp=5, beta=0.1,
            )

    cfg_train = _AttrDict(lr_min=0.0, lr_patience=10, lr_threshold=1e-4)
    with tempfile.TemporaryDirectory() as ckpt_dir:
        trainer = ref_training.Trainer(
            model=model,
            checkpointing_dir=ckpt_dir,
            config_train=cfg_train,
            optim_cls=torch.optim.Adam,
            sched_cls=torch.optim.lr_scheduler.ReduceLROnPlateau,
            lr=lr,
            device="cpu",
            config_data=cfg_data,
        )
        loader = DataLoader(train_set, batch_size=bs, shuffle=True,
                            num_workers=0)
        trainer.train(n_epochs, loader, F.mse_loss, val_data=val_set,
                      log_in_mlf=False)

        if scenario == "hard-2":
            (_, test_mpjpe), (_, test_preds), _ = trainer.eval(
                (val_set, test_set), ref_training.calc_mpjpe
            )
            (_, test_dtc), _, _ = trainer.eval(
                (val_set, test_set), ref_training.distance_to_circle
            )
            return {"test_mpjpe": float(test_mpjpe), "test_dtc": float(test_dtc)}

        (_, test_mpjpe), (_, test_preds), *_ = trainer.eval_3d(
            eval_sets=(val_set, test_set), metric=ref_training.calc_mpjpe_3D,
            distribution=None, major_radius=2, minor_radius=1,
        )
        if arch == "mlp":
            sl = ref_training.std_length(test_preds, joint_prediction=True,
                                         major_radius=2, minor_radius=1)
        elif arch == "constrained_rmcl":
            sl = ref_training.std_length(test_preds, joint_prediction=False,
                                         mcl_version=True,
                                         major_radius=2, minor_radius=1)
        else:
            sl = ref_training.std_length(test_preds, joint_prediction=False,
                                         major_radius=2, minor_radius=1)
        return {"test_mpjpe": float(test_mpjpe), "std_length": float(sl)}


# ---------------------------------------------------------------------------
# Our side (manipose_tpu.toy, same arrays/protocol)
# ---------------------------------------------------------------------------
def run_ours(scenario: str, arch: str, seed: int, splits, epochs=None):
    import jax

    from manipose_tpu.toy import (
        ConstrainedMlp,
        ConstrainedMlpRmcl,
        ConstrainedMlpRmclV2,
        ConstrainedMlpV2,
        ToyMlp,
        calc_mpjpe,
        calc_mpjpe_3d,
        distance_to_circle,
        std_length,
    )
    from manipose_tpu.toy.models import ACTIVATIONS
    from manipose_tpu.toy.trainer import ToyTrainer, ToyTrainerConfig

    (x_tr, y_tr), (x_va, y_va), (x_te, y_te) = splits
    act = ACTIVATIONS["tanh"]
    enabled_3d = scenario != "hard-2"
    joints_prediction = arch == "mlp"
    if not enabled_3d:
        lr, bs, n_epochs = 1e-2, 100, epochs or 50
        if arch == "mlp":
            model, kind = ToyMlp(32, 2, 2, act), "plain"
        elif arch == "constrained":
            model, kind = ConstrainedMlp(32, 2, act, 1.0), "plain"
        elif arch == "constrained_rmcl":
            model, kind = (
                ConstrainedMlpRmcl(32, 2, act, 1.0, n_hyp=5, beta=0.1), "mcl"
            )
        else:  # diffusion
            from manipose_tpu.toy.diffusion import LiftingDiffusionModel

            lr, bs, n_epochs = 1e-3, 100, epochs or 200
            model, kind = (
                LiftingDiffusionModel(
                    hidden_features=32, n_layers=2, num_steps=50,
                    schedule="cosine", beta_start=0.0001, beta_end=0.5,
                    n_samples=5, act=act,
                ),
                "diffusion",
            )
    else:
        lr, bs, n_epochs = 1e-3, 1000, epochs or 50
        if arch == "mlp":
            model, kind = ToyMlp(32, 6, 2, act), "plain"
        elif arch == "constrained":
            model, kind = ConstrainedMlpV2(32, 2, act, 2.0, 1.0), "plain"
        else:
            model, kind = (
                ConstrainedMlpRmclV2(32, 2, act, 2.0, 1.0, n_hyp=5, beta=0.1),
                "mcl",
            )

    if kind == "diffusion":
        variables = model.init(
            {"params": jax.random.PRNGKey(seed),
             "diffusion": jax.random.PRNGKey(seed + 1)},
            x_tr[:2], y_tr[:2], False,
        )
    else:
        variables = model.init(
            {"params": jax.random.PRNGKey(seed)}, x_tr[:2], train=False
        )
    trainer = ToyTrainer(
        model, variables,
        ToyTrainerConfig(
            epochs=n_epochs, batch_size=bs, lr=lr, lr_scheduler=True,
            lr_min=0.0, lr_patience=10, lr_threshold=1e-4, seed=seed,
        ),
        model_kind=kind, enabled_3d=enabled_3d,
        joints_prediction=joints_prediction, beta=0.1,
        major_radius=2.0, minor_radius=1.0,
    )
    trainer.train((x_tr, y_tr), val_data=(x_va, y_va))

    if not enabled_3d:
        (_, test_mpjpe), _, _ = trainer.evaluate(
            [(x_va, y_va), (x_te, y_te)], calc_mpjpe
        )
        (_, test_dtc), _, _ = trainer.evaluate(
            [(x_va, y_va), (x_te, y_te)], distance_to_circle
        )
        return {"test_mpjpe": float(test_mpjpe), "test_dtc": float(test_dtc)}

    (_, test_mpjpe), (_, test_preds), hyps = trainer.evaluate(
        [(x_va, y_va), (x_te, y_te)],
        lambda p, y: calc_mpjpe_3d(
            p, y, joints_predictions=joints_prediction if kind == "plain"
            else False, major_radius=2.0, minor_radius=1.0,
        ),
    )
    if kind == "plain" and joints_prediction:
        sl = std_length(test_preds, joint_prediction=True,
                        major_radius=2.0, minor_radius=1.0)
    elif kind == "mcl":
        sl = std_length(hyps[1], mcl_version=True,
                        major_radius=2.0, minor_radius=1.0)
    else:
        sl = std_length(test_preds, major_radius=2.0, minor_radius=1.0)
    return {"test_mpjpe": float(test_mpjpe), "std_length": float(sl)}


# ---------------------------------------------------------------------------
ARCHS = ("mlp", "constrained", "constrained_rmcl")
# the diffusion baseline is hard-2-only and slower (200 epochs + 50-step
# ancestral sampling); opt in with --archs ... diffusion
ALL_ARCHS = ARCHS + ("diffusion",)


def head_to_head(scenario: str, seeds, epochs=None, verbose=True,
                 archs=ARCHS):
    """Returns {arch: {"ref": {metric: [per-seed]}, "ours": {...}}}."""
    results = {a: {"ref": {}, "ours": {}} for a in archs}
    for seed in seeds:
        splits = (sample_circle(seed) if scenario == "hard-2"
                  else sample_torus(seed))
        for arch in archs:
            ref = run_reference(scenario, arch, seed, splits, epochs)
            ours = run_ours(scenario, arch, seed, splits, epochs)
            for k, v in ref.items():
                results[arch]["ref"].setdefault(k, []).append(v)
            for k, v in ours.items():
                results[arch]["ours"].setdefault(k, []).append(v)
            if verbose:
                print(f"[{scenario}] seed={seed} {arch:17s} "
                      + "  ".join(
                          f"{k}: ref={ref[k]:.4f} ours={ours[k]:.4f}"
                          for k in ref
                      ), flush=True)
    return results


def summarize(results):
    rows = []
    for arch, sides in results.items():
        for metric in sides["ref"]:
            r = np.asarray(sides["ref"][metric])
            o = np.asarray(sides["ours"][metric])
            rows.append({
                "arch": arch, "metric": metric,
                "ref_mean": float(r.mean()), "ref_std": float(r.std()),
                "ours_mean": float(o.mean()), "ours_std": float(o.std()),
            })
    return rows


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--seeds", type=int, nargs="+",
                   default=[42, 43, 44, 45, 46])
    p.add_argument("--scenarios", nargs="+", default=["hard-2", "torus"],
                   choices=["hard-2", "torus"])
    p.add_argument("--epochs-override", type=int, default=None)
    p.add_argument("--archs", nargs="+", default=list(ARCHS),
                   choices=list(ALL_ARCHS))
    p.add_argument("--json", type=Path,
                   default=REPO / "tools" / "artifacts" / "toy_head_to_head.json")
    args = p.parse_args()

    out = {}
    for scenario in args.scenarios:
        archs = tuple(a for a in args.archs
                      if not (a == "diffusion" and scenario != "hard-2"))
        results = head_to_head(scenario, args.seeds, args.epochs_override,
                               archs=archs)
        out[scenario] = {
            "seeds": args.seeds,
            "per_seed": results,
            "summary": summarize(results),
        }
        print(f"\n== {scenario} (mean ± std over {len(args.seeds)} seeds) ==")
        print(f"{'arch':18s} {'metric':12s} {'reference':>18s} {'ours':>18s}")
        for row in out[scenario]["summary"]:
            print(f"{row['arch']:18s} {row['metric']:12s} "
                  f"{row['ref_mean']:9.4f} ± {row['ref_std']:6.4f} "
                  f"{row['ours_mean']:9.4f} ± {row['ours_std']:6.4f}")

    args.json.parent.mkdir(parents=True, exist_ok=True)
    args.json.write_text(json.dumps(out, indent=2))
    print(f"\nwrote {args.json}")


if __name__ == "__main__":
    main()
