"""Logging helpers: CSV tables, metric averaging, optional MLflow.

Mirrors ``save_csv_log`` (``hpe/main_h36m_lifting.py:54-72``),
``AverageMeter``/``lr_decay`` (``hpe/mh_so3_hpe/utils.py:13-36``) and the
lazy MLflow helpers (``hpe/mh_so3_hpe/utils.py:127-179``)."""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np
import pandas as pd


class AverageMeter:
    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n=1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / self.count


def save_csv_log(
    output_dir,
    head,
    value: np.ndarray,
    is_create: bool = False,
    file_name: str = "test",
) -> str:
    if value.ndim < 2:
        value = np.expand_dims(value, axis=0)
    df = pd.DataFrame(value)
    file_path = os.path.join(str(output_dir), f"{file_name}.csv")
    if not os.path.exists(file_path) or is_create:
        df.to_csv(file_path, header=head, index=False)
    else:
        with open(file_path, "a") as f:
            df.to_csv(f, header=False, index=False)
    return file_path


class MetricLogger:
    """Epoch-metric sink: in-memory history + optional MLflow."""

    def __init__(self, mlflow_on: bool = False, experiment: str = "default",
                 tracking_uri: Optional[str] = None):
        self.history = []
        self.mlflow_on = mlflow_on
        self._mlf = None
        if mlflow_on:  # pragma: no cover - optional dependency
            try:
                import mlflow

                if tracking_uri:
                    mlflow.set_tracking_uri(tracking_uri)
                mlflow.set_experiment(experiment)
                self._mlf = mlflow
            except Exception:
                self.mlflow_on = False

    def log(self, metrics: Dict[str, float], step: int) -> None:
        self.history.append({"step": step, **metrics})
        if self._mlf is not None:  # pragma: no cover
            try:
                self._mlf.log_metrics(
                    {k: float(v) for k, v in metrics.items()}, step=step
                )
            except Exception:
                pass

    def log_params(self, params: Dict[str, object]) -> None:
        if self._mlf is not None:  # pragma: no cover
            try:
                self._mlf.log_params(params)
            except Exception:
                pass

    def save_csv(self, output_dir, file_name: str = "metrics") -> Optional[str]:
        """Dump the in-memory metric history as a CSV (the reference logs
        per-epoch metrics to MLflow; this is the always-on equivalent)."""
        if not self.history:
            return None
        path = os.path.join(str(output_dir), f"{file_name}.csv")
        pd.DataFrame(self.history).to_csv(path, index=False)
        return path
