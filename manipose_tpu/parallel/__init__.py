from .ring_attention import ring_attention
from .mesh import (
    fsdp_param_spec,
    make_mesh,
    param_spec,
    replicate,
    shard_batch,
    shard_params,
)

__all__ = [
    "fsdp_param_spec",
    "make_mesh",
    "param_spec",
    "replicate",
    "shard_batch",
    "shard_params",
    "ring_attention",
]
