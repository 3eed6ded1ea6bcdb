"""Skeleton-graph adjacency construction (legacy GCN support).

Rebuild of ``hpe/mh_so3_hpe/data/graph_utils.py`` (unused by the main
lifting path there too, kept for capability parity). Dense numpy instead
of scipy.sparse — J=17 graphs don't need sparsity.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

from ..geometry.skeleton import Skeleton


def edges_from_parents(parents: Sequence[int]) -> np.ndarray:
    return np.asarray(
        [(j, p) for j, p in enumerate(parents) if p >= 0], dtype=np.int64
    )


def adjacency_matrix(num_joints: int, edges: np.ndarray) -> np.ndarray:
    adj = np.zeros((num_joints, num_joints), np.float32)
    adj[edges[:, 0], edges[:, 1]] = 1.0
    adj[edges[:, 1], edges[:, 0]] = 1.0
    return adj


def normalize_adjacency(adj: np.ndarray) -> np.ndarray:
    """Symmetric normalization D^-1/2 (A + I) D^-1/2
    (``graph_utils.py:8-48`` semantics)."""
    a_hat = adj + np.eye(adj.shape[0], dtype=adj.dtype)
    deg = a_hat.sum(axis=1)
    d_inv_sqrt = 1.0 / np.sqrt(np.maximum(deg, 1e-12))
    return a_hat * d_inv_sqrt[:, None] * d_inv_sqrt[None, :]


def adj_mx_from_skeleton(skeleton: Skeleton) -> np.ndarray:
    """Normalized adjacency from a skeleton (``graph_utils.py:53-100``)."""
    edges = edges_from_parents(skeleton.parents)
    return normalize_adjacency(adjacency_matrix(skeleton.num_joints, edges))
