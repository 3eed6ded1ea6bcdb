"""Checkpointing: orbax save/restore + torch ``.pth`` conversion.

The reference saves ``model{tag}.pth`` + ``params{tag}.pth`` per tag
(best_val / best_mpjpe / best_oracle_mpjpe / best_ps_oracle_mpjpe / end,
``hpe/main_h36m_lifting.py:75-98``) and ships released checkpoints
(``manipose_h36m.pth``). ``convert_torch_state_dict`` maps those
state-dicts onto this package's flax param trees so released weights
reproduce reference numbers on TPU.
"""

from __future__ import annotations

import re
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp

    _HAS_ORBAX = True
except Exception:  # pragma: no cover
    _HAS_ORBAX = False


# ---------------------------------------------------------------------------
# Orbax save/restore (async: training overlaps the checkpoint write)
# ---------------------------------------------------------------------------

_CKPTR = None


def _checkpointer():
    global _CKPTR
    if _CKPTR is None:
        # StandardCheckpointer is an AsyncCheckpointer: save() returns
        # once the pytree is staged and commits in a background thread
        _CKPTR = ocp.StandardCheckpointer()
    return _CKPTR


def save_checkpoint(directory, tag: str, state, block: bool = False) -> None:
    """Save a pytree (params or TrainState) under ``directory/tag``.

    Asynchronous by default: the call returns after staging and the
    write commits in the background while training continues (the
    reference's ``torch.save`` blocks the train loop,
    ``main_h36m_lifting.py:75-98``). Consecutive saves serialize against
    each other; pass ``block=True`` (or call
    :func:`wait_for_checkpoints`) to wait for the commit — the train
    loop does so before returning.
    """
    assert _HAS_ORBAX
    path = Path(directory).resolve() / tag
    ckptr = _checkpointer()
    # serialize against any in-flight save (same-tag overwrites and
    # orbax's internal tmp-dir bookkeeping both require it)
    ckptr.wait_until_finished()
    ckptr.save(path, state, force=True)
    if block:
        ckptr.wait_until_finished()


def wait_for_checkpoints() -> None:
    """Block until every async checkpoint write has committed."""
    if _CKPTR is not None:
        _CKPTR.wait_until_finished()


def restore_checkpoint(directory, tag: str, target):
    """Restore a pytree saved by :func:`save_checkpoint`."""
    assert _HAS_ORBAX
    wait_for_checkpoints()  # the tag may still be committing
    path = Path(directory).resolve() / tag
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path, target)


def atomic_write_json(path, payload: dict) -> None:
    """Write JSON via tmp-file + rename so a crash never leaves a torn
    file (the same atomicity orbax's commit rename provides)."""
    import json
    import os

    path = Path(path)
    tmp = path.with_name(path.name + ".tmp")
    with open(tmp, "w") as f:
        json.dump(payload, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def find_resume_state(directory) -> Optional[tuple]:
    """Newest fully-committed resume state in ``directory`` ->
    ``(tag, host_dict)`` or None.

    Crash consistency (the failure-detection bar SURVEY §5 sets for
    elastic restart; no reference counterpart — its resume is manual):
    a kill mid-async-commit leaves an orbax tmp dir
    (``<tag>.orbax-checkpoint-tmp-*``) and, with single-name tags under
    ``save(force=True)``, can DELETE the previous committed state first
    — the restart would then crash on a pointer json describing a
    checkpoint that no longer exists. The loop therefore saves
    epoch-numbered tags (``train_state_NNNNNN``) and marks commit
    completion by writing ``host_state.json`` INSIDE the committed dir
    only after the blocking save returns. Discovery: the highest-epoch
    final-named dir that contains the sidecar. Torn commits (tmp-named
    dirs) and commit-without-sidecar dirs (killed between commit and
    sidecar write) are skipped — the previous committed epoch wins.

    Falls back to the two legacy layouts (``train_state/`` +
    ``train_state_host.json`` beside it, or ``host_state.json`` inside).
    """
    import json

    directory = Path(directory)
    candidates = [
        d for d in directory.glob("train_state_[0-9]*")
        # strict final naming: a ".orbax-checkpoint-tmp-*" dir is
        # structurally uncommitted whatever it contains
        if d.is_dir() and re.fullmatch(r"train_state_\d+", d.name)
        and (d / "host_state.json").exists()
    ]
    if candidates:
        chosen = max(candidates, key=lambda p: p.name)
        with open(chosen / "host_state.json") as f:
            return chosen.name, json.load(f)
    legacy = directory / "train_state"
    if legacy.is_dir():
        for host_json in (
            directory / "train_state_host.json",
            legacy / "host_state.json",
        ):
            if host_json.exists():
                with open(host_json) as f:
                    host = json.load(f)
                # New-format saves rewrite the beside-pointer too (with
                # tag=train_state_NNNNNN). If the numbered dirs are gone
                # but a STALE legacy train_state/ survives, pairing the
                # old params with that newer epoch/scheduler sidecar
                # would silently resume the wrong weights — only trust a
                # pointer that actually describes the legacy layout.
                if host.get("tag", "train_state") != "train_state":
                    continue
                return "train_state", host
    return None


def prune_resume_states(directory, keep: int = 2) -> None:
    """Delete all but the newest ``keep`` COMMITTED epoch-numbered
    resume states, plus crash debris: final-named dirs without the
    sidecar marker (a kill between orbax commit and sidecar write — the
    in-process flow always marks before pruning, so an unmarked dir is
    from a dead process) and orbax tmp dirs from torn commits (resume
    saves block, so no train_state tmp is ever legitimately in flight
    when this runs)."""
    import shutil

    directory = Path(directory)
    committed, debris = [], []
    for d in directory.glob("train_state_[0-9]*"):
        if not d.is_dir():
            continue
        if re.fullmatch(r"train_state_\d+", d.name):
            if (d / "host_state.json").exists():
                committed.append(d)
            else:
                debris.append(d)
        elif ".orbax-checkpoint-tmp-" in d.name:
            debris.append(d)
    committed.sort()
    for stale in (committed[:-keep] if keep else committed) + debris:
        shutil.rmtree(stale, ignore_errors=True)


# ---------------------------------------------------------------------------
# torch -> flax conversion
# ---------------------------------------------------------------------------

def _strip_wrappers(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """Unwrap ``{"model_pos": ...}`` and ``module.``-prefixed keys
    (``main_h36m_lifting.py:755-761`` + DataParallel)."""
    if "model_pos" in state_dict and isinstance(state_dict["model_pos"], dict):
        state_dict = state_dict["model_pos"]
    return {re.sub(r"^module\.", "", k): v for k, v in state_dict.items()}


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def _convert_trunk(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, Any]:
    """Map one torch MixSTE trunk (``mix_ste.py:12-126``) to our MixSTE.

    torch Linear weights are (out, in) -> flax kernels (in, out).
    """
    out: Dict[str, Any] = {}

    def linear(torch_name, flax_name):
        w = sd.get(f"{prefix}{torch_name}.weight")
        if w is None:
            return
        out[flax_name] = {
            "kernel": _np(w).T,
            "bias": _np(sd[f"{prefix}{torch_name}.bias"]),
        }

    def layernorm(torch_name, flax_name):
        w = sd.get(f"{prefix}{torch_name}.weight")
        if w is None:
            return
        out[flax_name] = {
            "scale": _np(w),
            "bias": _np(sd[f"{prefix}{torch_name}.bias"]),
        }

    linear("Spatial_patch_to_embedding", "spatial_embed")
    if f"{prefix}Spatial_pos_embed" in sd:
        out["spatial_pos_embed"] = _np(sd[f"{prefix}Spatial_pos_embed"])
        out["temporal_pos_embed"] = _np(sd[f"{prefix}Temporal_pos_embed"])
    layernorm("Spatial_norm", "spatial_norm")
    layernorm("Temporal_norm", "temporal_norm")
    # head = Sequential(LayerNorm, Linear) (``mix_ste.py:123-126``)
    layernorm("head.0", "head_norm")
    linear("head.1", "head")

    depth = 0
    while f"{prefix}STEblocks.{depth}.norm1.weight" in sd:
        depth += 1
    for blocks, name in (("STEblocks", "ste_block"), ("TTEblocks", "tte_block")):
        for i in range(depth):
            bp = f"{blocks}.{i}."
            block: Dict[str, Any] = {}
            for ln in ("norm1", "norm2"):
                block[ln] = {
                    "scale": _np(sd[f"{prefix}{bp}{ln}.weight"]),
                    "bias": _np(sd[f"{prefix}{bp}{ln}.bias"]),
                }
            block["attn"] = {
                "qkv": {
                    "kernel": _np(sd[f"{prefix}{bp}attn.qkv.weight"]).T,
                    "bias": _np(sd[f"{prefix}{bp}attn.qkv.bias"]),
                },
                "proj": {
                    "kernel": _np(sd[f"{prefix}{bp}attn.proj.weight"]).T,
                    "bias": _np(sd[f"{prefix}{bp}attn.proj.bias"]),
                },
            }
            block["mlp"] = {
                "fc1": {
                    "kernel": _np(sd[f"{prefix}{bp}mlp.fc1.weight"]).T,
                    "bias": _np(sd[f"{prefix}{bp}mlp.fc1.bias"]),
                },
                "fc2": {
                    "kernel": _np(sd[f"{prefix}{bp}mlp.fc2.weight"]).T,
                    "bias": _np(sd[f"{prefix}{bp}mlp.fc2.bias"]),
                },
            }
            out[f"{name}_{i}"] = block
    return out


def _convert_mcl_heads(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, Any]:
    """torch ModuleList of MCLHead (``rmcl_manifold_mix_ste.py:267-298``)
    -> stacked-parameter ``MCLHeads``."""
    n_hyp = 0
    while f"{prefix}head.{n_hyp}.norm.weight" in sd:
        n_hyp += 1
    assert n_hyp > 0, "no MCL heads found in state dict"
    ln_scale, ln_bias = [], []
    pred_k, pred_b, score_k, score_b = [], [], [], []
    for h in range(n_hyp):
        hp = f"{prefix}head.{h}."
        ln_scale.append(_np(sd[f"{hp}norm.weight"]))
        ln_bias.append(_np(sd[f"{hp}norm.bias"]))
        pred_k.append(_np(sd[f"{hp}prediction_head.weight"]).T)
        pred_b.append(_np(sd[f"{hp}prediction_head.bias"]))
        score_k.append(_np(sd[f"{hp}score_head.weight"]).T)
        score_b.append(_np(sd[f"{hp}score_head.bias"]))
    return {
        "ln_scale": np.stack(ln_scale),
        "ln_bias": np.stack(ln_bias),
        "pred_kernel": np.stack(pred_k),
        "pred_bias": np.stack(pred_b),
        "score_kernel": np.stack(score_k),
        "score_bias": np.stack(score_b),
    }


def _convert_segments(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, Any]:
    """torch BonesMixSTE (``manifold_mix_ste.py:91-154``) ->
    our ``BonesMixSTE`` (projection + trunk without patch embed)."""
    return {
        "joints_to_segments_proj": {
            "kernel": _np(sd[f"{prefix}joints_to_segments_proj.weight"]).T,
            "bias": _np(sd[f"{prefix}joints_to_segments_proj.bias"]),
        },
        "trunk": _convert_trunk(sd, prefix),
    }


def convert_torch_state_dict(state_dict: Dict[str, Any], arch: str) -> Dict:
    """Convert a reference checkpoint state-dict to a flax variables dict.

    arch: "mixste" | "manifold" | "rmcl_manifold"
    (``main_h36m_lifting.py:613-670``).
    """
    sd = {k: _np(v) for k, v in _strip_wrappers(state_dict).items()}
    if arch == "mixste":
        params = _convert_trunk(sd, "")
    elif arch == "manifold":
        params = {
            "rotations_module": _convert_trunk(sd, "rotations_module."),
            "segments_module": _convert_segments(sd, "segments_module."),
        }
    elif arch == "rmcl_manifold":
        params = {
            "rotations_module": {
                "trunk": _convert_trunk(sd, "rotations_module."),
                "heads": _convert_mcl_heads(sd, "rotations_module."),
            },
            "segments_module": _convert_segments(sd, "segments_module."),
        }
    else:
        raise ValueError(f"unknown arch: {arch}")
    return {"params": jax.tree_util.tree_map(np.asarray, params)}


def load_torch_checkpoint(path, arch: str) -> Dict:
    """Load a ``.pth`` file and convert. Requires torch (CPU is fine)."""
    import torch

    checkpoint = torch.load(path, map_location="cpu", weights_only=False)
    return convert_torch_state_dict(checkpoint, arch)


# ---------------------------------------------------------------------------
# Reverse conversion: flax variables -> reference torch state dict
# ---------------------------------------------------------------------------
def _rev_trunk(params: Dict[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    """Inverse of :func:`_convert_trunk` (flax kernels (in, out) ->
    torch Linear weights (out, in), reference naming
    ``mix_ste.py:12-126``)."""
    sd: Dict[str, np.ndarray] = {}

    def linear(flax_name, torch_name):
        mod = params.get(flax_name)
        if mod is None:
            return
        sd[f"{prefix}{torch_name}.weight"] = _np(mod["kernel"]).T
        sd[f"{prefix}{torch_name}.bias"] = _np(mod["bias"])

    def layernorm(flax_name, torch_name):
        mod = params.get(flax_name)
        if mod is None:
            return
        sd[f"{prefix}{torch_name}.weight"] = _np(mod["scale"])
        sd[f"{prefix}{torch_name}.bias"] = _np(mod["bias"])

    linear("spatial_embed", "Spatial_patch_to_embedding")
    if "spatial_pos_embed" in params:
        sd[f"{prefix}Spatial_pos_embed"] = _np(params["spatial_pos_embed"])
        sd[f"{prefix}Temporal_pos_embed"] = _np(params["temporal_pos_embed"])
    layernorm("spatial_norm", "Spatial_norm")
    layernorm("temporal_norm", "Temporal_norm")
    layernorm("head_norm", "head.0")
    linear("head", "head.1")

    for blocks, name in (("STEblocks", "ste_block"), ("TTEblocks", "tte_block")):
        i = 0
        while f"{name}_{i}" in params:
            block = params[f"{name}_{i}"]
            bp = f"{prefix}{blocks}.{i}."
            for ln in ("norm1", "norm2"):
                sd[f"{bp}{ln}.weight"] = _np(block[ln]["scale"])
                sd[f"{bp}{ln}.bias"] = _np(block[ln]["bias"])
            for mod, tname in (("qkv", "attn.qkv"), ("proj", "attn.proj")):
                sd[f"{bp}{tname}.weight"] = _np(block["attn"][mod]["kernel"]).T
                sd[f"{bp}{tname}.bias"] = _np(block["attn"][mod]["bias"])
            for fc in ("fc1", "fc2"):
                sd[f"{bp}mlp.{fc}.weight"] = _np(block["mlp"][fc]["kernel"]).T
                sd[f"{bp}mlp.{fc}.bias"] = _np(block["mlp"][fc]["bias"])
            i += 1
    return sd


def _rev_mcl_heads(heads: Dict[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    """Inverse of :func:`_convert_mcl_heads` — stacked params back to a
    torch ModuleList of MCLHead (``rmcl_manifold_mix_ste.py:267-298``)."""
    sd: Dict[str, np.ndarray] = {}
    n_hyp = int(np.shape(heads["ln_scale"])[0])
    for h in range(n_hyp):
        hp = f"{prefix}head.{h}."
        sd[f"{hp}norm.weight"] = _np(heads["ln_scale"][h])
        sd[f"{hp}norm.bias"] = _np(heads["ln_bias"][h])
        sd[f"{hp}prediction_head.weight"] = _np(heads["pred_kernel"][h]).T
        sd[f"{hp}prediction_head.bias"] = _np(heads["pred_bias"][h])
        sd[f"{hp}score_head.weight"] = _np(heads["score_kernel"][h]).T
        sd[f"{hp}score_head.bias"] = _np(heads["score_bias"][h])
    return sd


def _rev_segments(params: Dict[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    sd = {
        f"{prefix}joints_to_segments_proj.weight":
            _np(params["joints_to_segments_proj"]["kernel"]).T,
        f"{prefix}joints_to_segments_proj.bias":
            _np(params["joints_to_segments_proj"]["bias"]),
    }
    sd.update(_rev_trunk(params["trunk"], prefix))
    return sd


def convert_to_torch_state_dict(variables: Dict, arch: str) -> Dict[str, np.ndarray]:
    """Inverse of :func:`convert_torch_state_dict`: flax variables ->
    a reference-named state dict (numpy values), so models trained here
    can be loaded back into the reference PyTorch code
    (``main_h36m_lifting.py:755-761``)."""
    params = variables.get("params", variables)
    if arch == "mixste":
        return _rev_trunk(params, "")
    if arch == "manifold":
        sd = _rev_trunk(params["rotations_module"], "rotations_module.")
        sd.update(_rev_segments(params["segments_module"], "segments_module."))
        return sd
    if arch == "rmcl_manifold":
        sd = _rev_trunk(
            params["rotations_module"]["trunk"], "rotations_module."
        )
        sd.update(_rev_mcl_heads(
            params["rotations_module"]["heads"], "rotations_module."
        ))
        sd.update(_rev_segments(params["segments_module"], "segments_module."))
        return sd
    raise ValueError(f"unknown arch: {arch}")


def save_torch_checkpoint(path, variables: Dict, arch: str) -> None:
    """Write a ``model.pth`` loadable by the reference drivers.

    Requires torch (CPU is fine); tensors are saved fp32 under the
    ``model_pos`` wrapper the reference loader accepts."""
    import torch

    sd = {
        k: torch.from_numpy(np.asarray(v, np.float32))
        for k, v in convert_to_torch_state_dict(variables, arch).items()
    }
    torch.save({"model_pos": sd}, path)
