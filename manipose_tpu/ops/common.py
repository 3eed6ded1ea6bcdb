"""Shared helpers for the Pallas kernel modules."""

from __future__ import annotations

import jax


def needs_interpret() -> bool:
    """Pallas TPU kernels run compiled on TPU-class backends and in
    interpreter mode everywhere else (the CPU test backend)."""
    return jax.default_backend() not in ("tpu", "axon")
