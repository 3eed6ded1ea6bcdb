"""ManiPose-TPU: a TPU-native JAX/XLA/Pallas rebuild of ManiPose.

ManiPose (NeurIPS 2024, arXiv 2312.06386) is a manifold-constrained
multi-hypothesis 2D->3D human-pose lifting framework. This package
re-implements all of its capabilities TPU-first:

- ``geometry``  : kinematic-tree skeletons, SO(3) rotation representations,
                  level-parallel forward kinematics (XLA-friendly).
- ``models``    : MixSTE spatio-temporal transformer, manifold-constrained
                  decoder, rMCL multi-hypothesis heads (flax.linen).
- ``ops``       : fused attention (XLA + Pallas TPU kernels).
- ``metrics``   : MPJPE family, WTA/MCL losses, consistency metrics
                  (MPSSE/MPSCE), Procrustes P-MPJPE (batched SVD), PCK/AUC.
- ``data``      : Human3.6M / MPI-INF-3DHP pipelines, camera models,
                  sequence windowing, occlusion simulation, flip augmentation.
- ``train``     : jitted train/eval steps, optimizers, LR schedules,
                  checkpointing (orbax) and torch-checkpoint conversion.
- ``eval``      : hypothesis aggregation, TTA-flip evaluation, oracle metrics.
- ``parallel``  : device meshes and shardings (dp/tp) over ICI.
- ``toy``       : the paper's toy circle/torus experiments.

Reference behavior citations point into the upstream PyTorch codebase
(cedricrommel/manipose) as ``file:line``.
"""

__version__ = "0.1.0"


def __getattr__(name):  # lazy top-level conveniences
    if name == "Predictor":
        from .serving import Predictor

        return Predictor
    if name == "load_config":
        from .config import load_config

        return load_config
    raise AttributeError(name)
