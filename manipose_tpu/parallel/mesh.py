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
    data: int, model: int = 1, devices: Optional[list] = None
) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    assert data * model <= len(devices), (
        f"mesh {data}x{model} needs {data * model} devices, "
        f"have {len(devices)}"
    )
    mesh_devices = mesh_utils.create_device_mesh(
        (data, model), devices=devices[: data * model]
    )
    return Mesh(mesh_devices, axis_names=("data", "model"))


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


def fsdp_param_spec(path: str, shape, data_size: int) -> P:
    """ZeRO-3-style spec: on top of the TP rules, shard the largest
    still-free axis divisible by the ``data`` mesh size over ``data``.

    With params laid out this way and the jitted step's output shardings
    matching, XLA inserts the all-gather-on-use / reduce-scatter-on-grad
    pattern automatically — per-device param+optimizer memory drops by
    ~the data-axis size, which is what makes >1B-param variants of this
    trunk trainable on a pod slice.
    """
    spec = list(param_spec(path))
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

    mode="tp"   — Megatron TP rules on the trunk matmuls, rest replicated
    mode="fsdp" — TP rules + largest free axis sharded over ``data``
                  (fully-sharded data parallelism / ZeRO-3)
    """
    assert mode in ("tp", "fsdp"), mode
    data_size = mesh.shape.get("data", 1)

    def place(path, x):
        p = jax.tree_util.keystr(path, simple=True, separator="/")
        if mode == "fsdp":
            spec = fsdp_param_spec(p, np.shape(x), data_size)
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
