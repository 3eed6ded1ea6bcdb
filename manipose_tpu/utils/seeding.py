"""Deterministic seeding helpers.

Counterpart of ``hpe/mh_so3_hpe/utils.py:50-120``: the reference seeds
python/numpy/torch and sets cuDNN/CUBLAS determinism knobs. In JAX,
determinism is structural — all randomness flows through explicit
``jax.random`` keys and ``np.random.Generator`` streams — so this module
only centralizes key/stream derivation.
"""

from __future__ import annotations

import random
from typing import Tuple

import jax
import numpy as np


def set_random_seeds(seed: int) -> Tuple[jax.Array, np.random.Generator]:
    """Seed ambient python/numpy state and derive the canonical
    (jax key, numpy generator) pair used by the drivers."""
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed), np.random.default_rng(seed)


def epoch_rng(seed: int, epoch: int) -> np.random.Generator:
    """Per-epoch host data stream (replaces torch's ``seed_worker``,
    ``utils.py:117-120``)."""
    return np.random.default_rng(np.random.SeedSequence([seed, epoch]))
