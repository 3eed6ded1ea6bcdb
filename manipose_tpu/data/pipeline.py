"""Batched input pipeline feeding static-shape device batches.

TPU-first replacement for torch ``DataLoader`` + worker processes
(``hpe/main_h36m_lifting.py:599-609``): a single-process numpy loader
with deterministic per-epoch RNG streams. Batches always have the full
static ``batch_size`` (XLA never recompiles); a ``valid`` mask marks
padding rows in the final batch so eval metrics stay exact.
"""

from __future__ import annotations

import dataclasses
import queue
import threading
from typing import Iterable, Iterator, Optional

import numpy as np

from .windowing import PoseSequenceDataset


@dataclasses.dataclass
class Batch:
    pose_2d: np.ndarray  # (B, L, J, 2)
    pose_3d: np.ndarray  # (B, L, J, 3)
    valid: np.ndarray  # (B,) float32 — 0 marks padding rows

    @property
    def batch_size(self) -> int:
        return self.pose_2d.shape[0]


class SequenceLoader:
    """Deterministic, shuffled, fixed-shape batch iterator."""

    def __init__(
        self,
        dataset: PoseSequenceDataset,
        batch_size: int,
        shuffle: bool = False,
        seed: int = 0,
        drop_last: bool = False,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self._epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self._epoch = epoch

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator[Batch]:
        n = len(self.dataset)
        rng = np.random.default_rng(
            np.random.SeedSequence([self.seed, self._epoch])
        )
        order = rng.permutation(n) if self.shuffle else np.arange(n)
        for start in range(0, n, self.batch_size):
            idx = order[start : start + self.batch_size]
            if self.drop_last and len(idx) < self.batch_size:
                break
            valid = np.ones(self.batch_size, np.float32)
            n_pad = self.batch_size - len(idx)
            if n_pad > 0:
                idx = np.concatenate([idx, np.repeat(idx[-1:], n_pad)])
                valid[self.batch_size - n_pad:] = 0.0
            pose_2d, pose_3d = self.dataset.get_batch(idx, rng)
            yield Batch(pose_2d=pose_2d, pose_3d=pose_3d, valid=valid)
        self._epoch += 1


def prefetch(iterable: Iterable, size: int = 2) -> Iterator:
    """Run an iterator in a background thread with a bounded queue so
    host batch assembly overlaps device compute (the torch-DataLoader
    worker role, in-process)."""
    q: queue.Queue = queue.Queue(maxsize=size)
    sentinel = object()

    def producer():
        try:
            for item in iterable:
                q.put(item)
            q.put(sentinel)
        except BaseException as exc:  # propagate to the consumer
            q.put(exc)

    thread = threading.Thread(target=producer, daemon=True)
    thread.start()
    while True:
        item = q.get()
        if item is sentinel:
            break
        if isinstance(item, BaseException):
            raise item
        yield item
