#!/usr/bin/env python
"""Driver-level trained-model parity on the MPI-INF-3DHP PROTOCOL: the
reference's own 3DHP driver (``/root/reference/hpe/main_3dhp.py`` —
its ``train()`` copy and its PCK@150/AUC test block, imported
read-only) vs this framework, on identical synthetic pose data.

Shares the FK-synthetic video generator and the model/optimizer
protocol with ``tools/h36m_head_to_head.py`` (the working skeleton is
topologically identical — ``dataset_3dhp.py:132-138`` permutes MPI
joints into the H36M-17 order on load); what this adds is the second
dataset family's TRAINING DRIVER and TEST PROTOCOL trained end to end
on both sides: reference ``main_3dhp.train`` + ``eval_utils.evaluate``
+ ``keypoint_3d_pck/auc`` (oracle preds for pck/auc, aggregated preds
for agg_pck/agg_auc, consistency on the oracle preds —
``main_3dhp.py:800-905``) against our ``train.loop.train`` +
``eval.engine.evaluate`` + ``metrics.pck``.

  python tools/dhp3_head_to_head.py [--seeds 0 1 2] [--epochs 10]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from manipose_tpu.utils.platform import apply_platform_env  # noqa: E402

apply_platform_env()

from h36m_head_to_head import main  # noqa: E402

if __name__ == "__main__":
    main(protocol="3dhp", doc=__doc__)
