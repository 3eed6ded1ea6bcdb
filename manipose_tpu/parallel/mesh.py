"""Device meshes and shardings (dp + tp over ICI).

The reference's only multi-device mechanism is single-process
``nn.DataParallel`` (``hpe/main_h36m_lifting.py:747-753``). Here the
equivalent is a 2-axis ``jax.sharding.Mesh``:

- ``data``:  batch axis sharding (pure DP; gradients reduce via the
  ``psum`` XLA inserts inside the jitted step)
- ``model``: Megatron-style tensor parallelism of the transformer's
  matmuls (qkv/proj and MLP fc1/fc2 kernels), sized so collectives ride
  ICI. The ~35M-param model doesn't *need* TP; the axis exists so the
  same code scales and so sharding is exercised in CI on a virtual mesh.
"""

from __future__ import annotations

import re
from typing import Optional, Tuple

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data: int, model: int = 1, pipe: int = 1,
    devices: Optional[list] = None,
) -> Mesh:
    """dp x tp mesh ("data", "model"), or dp x pp ("data", "pipe") when
    ``pipe`` > 1 (GPipe stages live one-per-device along 'pipe';
    composing TP and PP in one mesh is not supported)."""
    devices = devices if devices is not None else jax.devices()
    assert not (model > 1 and pipe > 1), (
        "tensor and pipeline parallelism cannot share a mesh "
        f"(model={model}, pipe={pipe})"
    )
    second = max(model, pipe)
    assert data * second <= len(devices), (
        f"mesh {data}x{second} needs {data * second} devices, "
        f"have {len(devices)}"
    )
    mesh_devices = mesh_utils.create_device_mesh(
        (data, second), devices=devices[: data * second]
    )
    axis = "pipe" if pipe > 1 else "model"
    return Mesh(mesh_devices, axis_names=("data", axis))


# param-path regex -> PartitionSpec (Megatron TP on the trunk matmuls)
_PARAM_RULES: Tuple[Tuple[str, P], ...] = (
    (r"attn/qkv/kernel$", P(None, "model")),
    (r"attn/qkv/bias$", P("model")),
    (r"attn/proj/kernel$", P("model", None)),
    (r"mlp/fc1/kernel$", P(None, "model")),
    (r"mlp/fc1/bias$", P("model")),
    (r"mlp/fc2/kernel$", P("model", None)),
)


def param_spec(path: str) -> P:
    for pattern, spec in _PARAM_RULES:
        if re.search(pattern, path):
            return spec
    return P()  # replicated


def fsdp_param_spec(path: str, shape, data_size: int, use_tp: bool = True) -> P:
    """ZeRO-3-style spec: on top of the TP rules, shard the largest
    still-free axis divisible by the ``data`` mesh size over ``data``.

    With params laid out this way and the jitted step's output shardings
    matching, XLA inserts the all-gather-on-use / reduce-scatter-on-grad
    pattern automatically — per-device param+optimizer memory drops by
    ~the data-axis size, which is what makes >1B-param variants of this
    trunk trainable on a pod slice.

    ``use_tp=False`` skips the Megatron rules (ZeRO-3 over ``data``
    only) — used when the 'model' mesh axis is repurposed for ring
    sequence parallelism and must not also shard the matmuls.
    """
    spec = list(param_spec(path)) if use_tp else []
    spec += [None] * (len(shape) - len(spec))
    if data_size > 1 and len(shape) >= 1:
        order = sorted(range(len(shape)), key=lambda i: -shape[i])
        for i in order:
            if spec[i] is None and shape[i] % data_size == 0 and shape[i] >= data_size:
                spec[i] = "data"
                break
    while spec and spec[-1] is None:
        spec.pop()
    return P(*spec)


def shard_params(params, mesh: Mesh, mode: str = "tp"):
    """Place a param pytree on the mesh.

    mode="tp"      — Megatron TP rules on the trunk matmuls, rest replicated
    mode="fsdp"    — TP rules + largest free axis sharded over ``data``
                     (fully-sharded data parallelism / ZeRO-3)
    mode="dp"      — everything replicated (pure data parallelism; the
                     layout when the 'model' axis carries ring sequence
                     parallelism instead of TP)
    mode="fsdp_dp" — ZeRO-3 over ``data`` only, no TP rules (fsdp + ring)
    """
    assert mode in ("tp", "fsdp", "dp", "fsdp_dp"), mode
    data_size = mesh.shape.get("data", 1)

    def place(path, x):
        p = jax.tree_util.keystr(path, simple=True, separator="/")
        if mode.startswith("fsdp"):
            spec = fsdp_param_spec(
                p, np.shape(x), data_size, use_tp=(mode == "fsdp")
            )
        elif mode == "dp":
            spec = P()
        else:
            spec = param_spec(p)
        if np.ndim(x) < len([a for a in spec if a is not None]):
            spec = P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def shard_batch(tree, mesh: Mesh):
    """Shard leading (batch) axis over the 'data' mesh axis."""

    def place(x):
        spec = P("data") if np.ndim(x) >= 1 else P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(place, tree)


def replicate(tree, mesh: Mesh):
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree
    )
