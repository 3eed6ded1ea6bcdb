"""Shared driver plumbing: model factory, loaders, subject splits.

Rebuild of the helper layer of ``hpe/main_h36m_lifting.py:511-708``.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..data import PoseSequenceDataset, SequenceLoader
from ..geometry.h36m import TEST_SUBJECTS, TRAIN_SUBJECTS
from ..geometry.skeleton import Skeleton
from ..models import (
    ManifoldConfig,
    ManifoldMixSTE,
    MixSTE,
    MixSTEConfig,
    RMCLManifoldMixSTE,
)

_DTYPES = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}


def instantiate_model(cfg: Config, skeleton: Skeleton, quant: bool = False):
    """Model factory (``main_h36m_lifting.py:613-670``). Returns
    (flax module, is_rmcl). ``quant=True`` builds the int8-serving
    variant (``ops/quant.py``)."""
    m = cfg.model
    dtype = _DTYPES[m.get("dtype", "float32")]
    attn_impl = m.get("attn_impl", "xla")
    mlp_impl = m.get("mlp_impl", "xla")
    layout = m.get("layout", "fold")
    ring = None
    if attn_impl == "ring":
        # sequence-parallel temporal attention: the frame axis shards
        # over the mesh's 'model' axis (so params are NOT tensor-
        # parallel there — train/loop.py switches the param mode to dp)
        from ..parallel import RingSpec, make_mesh

        pcfg = cfg.get("parallel") or {}
        n_model = int(pcfg.get("model", 1))
        assert n_model > 1, (
            "model.attn_impl=ring shards the sequence over the 'model' "
            "mesh axis; set parallel.model > 1"
        )
        mesh = make_mesh(
            data=int(pcfg.get("data", 1)), model=n_model
        )
        ring = RingSpec(mesh=mesh, axis="model", batch_axis="data")
    if m.arch == "mixste":
        model = MixSTE(
            MixSTEConfig(
                num_frame=cfg.data.seq_len,
                num_joints=skeleton.num_joints,
                in_chans=2,
                out_dim=3,
                num_heads=m.nheads,
                depth=m.layers,
                embed_dim=m.channels,
                drop_path_rate=m.drop_path_rate,
                mup=m.mup,
                dtype=dtype,
                attn_impl=attn_impl,
                ring=ring,
                mlp_impl=mlp_impl,
                layout=layout,
                quant=quant,
            )
        )
        return model, False
    manifold_cfg = ManifoldConfig(
        num_frame=cfg.data.seq_len,
        num_joints=skeleton.num_joints,
        num_bones=skeleton.num_bones,
        in_chans=2,
        rot_rep_dim=m.rot_dim,
        num_heads_rot=m.nheads,
        depth_rot=m.layers,
        embed_dim_rot=m.channels,
        num_heads_seg=m.nheads_seg,
        depth_seg=m.layers_seg,
        embed_dim_seg=m.channels_seg,
        drop_path_rate=m.drop_path_rate,
        n_hyp=cfg.multi_hyp.n_hyp,
        mup=m.mup,
        dtype=dtype,
        attn_impl=attn_impl,
        ring=ring,
        mlp_impl=mlp_impl,
        layout=layout,
        quant=quant,
    )
    if m.arch == "manifold":
        return ManifoldMixSTE(manifold_cfg, skeleton), False
    if m.arch == "rmcl_manifold":
        return RMCLManifoldMixSTE(manifold_cfg, skeleton), True
    raise ValueError(
        "Only MixSTE, Manifold-MixSTE and RMCL-Manifold-MixSTE implemented"
        f" for now. Got option {m.arch}."
    )


def init_model_params(model, cfg: Config, num_joints: int):
    x = jnp.zeros((1, cfg.data.seq_len, num_joints, 2), jnp.float32)
    params = model.init(jax.random.PRNGKey(cfg.run.seed), x)
    if cfg.model.get("init", "flax") == "torch":
        # torch-default Linear init (matches the reference's fresh-
        # training starting conditions; see train/init.py)
        from ..train.init import torch_match_init

        params = torch_match_init(params, cfg.run.seed)
    return params


def maybe_restore_eval_params(variables, cfg: Config):
    """Eval-only restore of this framework's OWN checkpoints.

    ``run.checkpoint_model`` covers converted torch ``.pth`` files (the
    reference's eval-from-checkpoint path, ``main_h36m_lifting.py:755-761``)
    and ``run.checkpoint_params`` resumes training — but a user who
    trained HERE holds orbax best-tag dirs (``best_mpjpe``, ...). When
    ``run.train`` is false and ``run.checkpoint_params`` points at such
    a tag dir, load its params for the test protocol instead of evaluating
    freshly initialized weights.
    """
    path = cfg.run.get("checkpoint_params", "")
    if cfg.run.train or not path:
        return variables
    from ..train.checkpoint import restore_checkpoint

    tag_dir = Path(path)
    print(f"==> eval-only: restoring params from {tag_dir}")
    return restore_checkpoint(tag_dir.parent, tag_dir.name, variables)


def get_subjects_and_actions(dataset, cfg: Config):
    """(``main_h36m_lifting.py:543-566``)"""
    if cfg.data.use_valid:
        subjects_train = list(TRAIN_SUBJECTS[:-1])
        subjects_val = list(TRAIN_SUBJECTS[-1:])
    else:
        subjects_train = list(TRAIN_SUBJECTS)
        subjects_val = []
    subjects_test = list(TEST_SUBJECTS)
    if cfg.data.data == "one":
        subjects_train = [subjects_train[0]]
    action_filter = (
        None if cfg.data.actions == "*" else cfg.data.actions.split(",")
    )
    if action_filter is not None:
        action_filter = [dataset.define_actions(a)[0] for a in action_filter]
    return [subjects_train, subjects_val, subjects_test], action_filter


def create_loader(
    keypoints,
    dataset,
    action_filter,
    subjects: Sequence[str],
    cfg: Config,
    train: bool = True,
) -> SequenceLoader:
    """(``main_h36m_lifting.py:569-610``)"""
    from ..data import fetch

    poses, poses_2d, _, cameras = fetch(
        subjects, dataset, keypoints, action_filter
    )
    ds = PoseSequenceDataset(
        poses,
        poses_2d,
        cameras,
        seq_len=cfg.data.seq_len,
        random_start=train,
        miss_type=cfg.data.miss_type,
        miss_rate=cfg.data.miss_rate,
        noise_sigma=cfg.data.noise_sigma,
        skeleton=dataset.skeleton,
        flip_probability=0.5 if (train and cfg.train.flip_aug) else 0.0,
    )
    return SequenceLoader(
        ds,
        batch_size=cfg.train.batch_size if train else cfg.train.batch_size_test,
        shuffle=train,
        seed=cfg.run.seed,
    )


def wants_cpu_collectives(cfg: Config) -> bool:
    """Whether this run's config implies multi-device collectives that
    would execute on a CPU backend's in-process communicator.

    Used to gate the persistent compile cache off (see
    ``utils.compile_cache.enable_compilation_cache``): warm XLA:CPU AOT
    reloads of collective programs can deterministically wedge a
    cross-op rendezvous (the MULTICHIP_r04 failure class). True when a
    >1-device mesh or ring attention is requested; always False on TPU
    backends, whose ICI collectives are compiled into the program and
    never touch the CPU rendezvous runtime.
    """
    par = cfg.get("parallel") or {}
    n_mesh = (
        int(par.get("data", 1))
        * int(par.get("model", 1))
        * int(par.get("pipe", 1))
    )
    model = cfg.get("model") or {}
    return n_mesh > 1 or model.get("attn_impl", "xla") == "ring"
