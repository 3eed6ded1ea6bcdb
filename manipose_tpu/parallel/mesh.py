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


def shard_params(params, mesh: Mesh):
    """Place a param pytree on the mesh per the TP rules."""

    def place(path, x):
        spec = param_spec(jax.tree_util.keystr(path, simple=True, separator="/"))
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
