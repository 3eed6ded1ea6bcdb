"""Batch inference / serving API.

The reference has no serving layer (research drivers only); production
use of a lifting model is "give me 3D poses for this 2D keypoint video".
:class:`Predictor` packages that: fixed-shape jitted forward (no
recompiles across videos), sequence windowing with replicate padding,
optional TTA flip and hypothesis aggregation, and loading either flax
checkpoints (orbax) or reference ``.pth`` files via the converter.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import Config, load_config
from .data.native import gather_windows
from .drivers.common import init_model_params, instantiate_model
from .eval.engine import flip_poses
from .utils.platform import tpu_compiler_options
from .geometry.skeleton import Skeleton
from .models.rmcl import aggregate_hypotheses


class _LazyWindows:
    """Overlapping windows gathered on slice access: holds (video, idx)
    so only one batch of windows is ever materialized at a time."""

    def __init__(self, video: np.ndarray, idx: np.ndarray):
        self._video = video
        self._idx = idx

    def __getitem__(self, s) -> np.ndarray:
        return self._video[self._idx[s]]


class Predictor:
    """Lift 2D keypoint videos to 3D poses.

    Args:
      cfg: full Config (model/data groups define the architecture).
      skeleton: kinematic skeleton (defaults to the dataset's 17-joint).
      variables: flax variables; if None, random init (for testing).
      batch_size: static windows-per-call (padded; no recompiles).
      tta: average with the flipped input (``eval_utils.py:78-142``).
      quantize: serve with int8 weight+activation trunk matmuls
        (``ops/quant.py``; TPU MXUs nominally run int8 at 2x the bf16
        rate). ``True`` first MICROPROBES the actual int8-vs-bf16 GEMM
        rate on this device and falls back to float (with a warning)
        when int8 is not measurably faster — some deployments execute
        int8 at bf16 rates, where quantizing would silently REGRESS
        throughput (BASELINE.md r2). ``"force"`` skips the probe.
        Float ``variables`` are quantized on construction; check
        ``self.quantized`` for the effective mode.
      data_parallel: shard the window batch over all local devices
        (params replicated, batch split on a 1-axis 'data' mesh) —
        multi-chip batch inference with unchanged outputs.
        ``batch_size`` must divide by the device count.
    """

    _int8_probe_cache: Optional[float] = None  # once per process

    def __init__(
        self,
        cfg: Optional[Config] = None,
        skeleton: Optional[Skeleton] = None,
        variables=None,
        batch_size: int = 8,
        tta: bool = True,
        quantize: bool = False,
        data_parallel: bool = False,
    ):
        if cfg is None:
            cfg = load_config("config")
        if skeleton is None:
            from .geometry import h36m_skeleton_17

            skeleton = h36m_skeleton_17()
        self.cfg = cfg
        self.skeleton = skeleton
        self.seq_len = cfg.data.seq_len
        self.batch_size = batch_size
        self.tta = tta
        self.model, self.rmcl = instantiate_model(cfg, skeleton)
        self.variables = (
            variables
            if variables is not None
            else init_model_params(self.model, cfg, skeleton.num_joints)
        )
        if quantize and quantize != "force":
            from .ops.quant import int8_speedup

            if Predictor._int8_probe_cache is None:
                Predictor._int8_probe_cache = float(int8_speedup())
            ratio = Predictor._int8_probe_cache
            if ratio < 1.05:  # not faster beyond measurement noise
                import warnings

                warnings.warn(
                    f"int8 GEMMs are not faster than bf16 on this device "
                    f"(measured ratio {ratio:.2f}); serving stays on the "
                    f"float path. Pass quantize='force' to override.",
                    stacklevel=2,
                )
                quantize = False
        self.quantized = bool(quantize)
        if quantize:
            from .ops.quant import quantize_params

            self.model, self.rmcl = instantiate_model(
                cfg, skeleton, quant=True
            )
            self.variables = quantize_params(self.variables)

        forward = self._make_forward(self.model)
        self._raw_forward = forward  # unjitted: reused by export_stablehlo
        self.mesh = None
        if data_parallel:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from .parallel import make_mesh, replicate

            n_dev = len(jax.devices())
            if batch_size % n_dev:  # not assert: must survive python -O
                raise ValueError(
                    f"batch_size={batch_size} must divide over {n_dev} "
                    "devices"
                )
            self.mesh = make_mesh(data=n_dev)
            self.variables = replicate(self.variables, self.mesh)
            self._forward = jax.jit(
                forward,
                in_shardings=(
                    NamedSharding(self.mesh, P()),  # params: replicated
                    NamedSharding(self.mesh, P("data")),  # batch: split
                ),
                compiler_options=tpu_compiler_options(),
            )
        else:
            # scoped-VMEM budget: measured +1.5% on this forward on-chip
            # (BASELINE.md round-3 "XLA compiler-option sweep")
            self._forward = jax.jit(
                forward, compiler_options=tpu_compiler_options()
            )

    def _make_forward(self, model):
        """Windows-batch forward: apply + TTA flip + score aggregation."""
        skeleton = self.skeleton

        def forward(variables, x):
            pred = model.apply(variables, x, deterministic=True)
            if self.rmcl:
                hyps, scores = pred
                agg = aggregate_hypotheses(hyps, scores, "weighted_ave")
            else:
                hyps, scores = None, None
                agg = pred
            if self.tta:
                flipped = model.apply(
                    variables, flip_poses(x, skeleton), deterministic=True
                )
                if self.rmcl:
                    f_hyps, f_scores = flipped
                    f_agg = aggregate_hypotheses(
                        f_hyps, f_scores, "weighted_ave"
                    )
                else:
                    f_agg = flipped
                agg = (agg + flip_poses(f_agg, skeleton)) / 2
            return agg, hyps, scores

        return forward

    # ------------------------------------------------------------------
    @classmethod
    def from_any(
        cls,
        checkpoint: str = "",
        tag: str = "best_val",
        cfg: Optional[Config] = None,
        **kw,
    ):
        """One loader for every checkpoint flavor.

        ``*.pth`` files go through the reference-format converter,
        anything else non-empty is treated as an orbax run directory
        (``tag`` selects the best-tag subtree), and an empty string
        yields random weights (smoke-test mode, with a warning). All
        CLI tools route through here so the dispatch logic cannot
        drift between them.
        """
        checkpoint = str(checkpoint or "")
        if checkpoint.endswith(".pth"):
            return cls.from_torch_checkpoint(checkpoint, cfg=cfg, **kw)
        if checkpoint:
            return cls.from_checkpoint(checkpoint, tag=tag, cfg=cfg, **kw)
        import warnings

        warnings.warn(
            "no checkpoint given; using random weights (smoke-test mode)",
            stacklevel=2,
        )
        return cls(cfg=cfg, **kw)

    @classmethod
    def from_torch_checkpoint(cls, path, cfg: Optional[Config] = None, **kw):
        """Load a reference ``.pth`` checkpoint (e.g. manipose_h36m.pth)."""
        if cfg is None:
            cfg = load_config("config")
        from .train.checkpoint import load_torch_checkpoint

        variables = jax.tree_util.tree_map(
            jnp.asarray, load_torch_checkpoint(path, cfg.model.arch)
        )
        return cls(cfg=cfg, variables=variables, **kw)

    @classmethod
    def from_checkpoint(cls, directory, tag: str = "best_val",
                        cfg: Optional[Config] = None, **kw):
        """Load an orbax checkpoint written by the training loop.

        Checkpoints are float trees, so the restore target must be the
        float template — quantization (``quantize=True``) is applied
        AFTER restoring (a quantized template has a different tree
        structure: kernel -> kernel_q + scale)."""
        if cfg is None:
            cfg = load_config("config")
        from .train.checkpoint import restore_checkpoint

        quantize = kw.pop("quantize", False)
        predictor = cls(cfg=cfg, quantize=False, **kw)
        predictor.variables = restore_checkpoint(
            directory, tag, predictor.variables
        )
        if quantize:
            return cls(
                cfg=cfg, variables=predictor.variables, quantize=True, **kw
            )
        return predictor

    # ------------------------------------------------------------------
    def export_stablehlo(self, path=None, batch_symbolic: bool = True):
        """Serialize the forward pass as a portable StableHLO artifact.

        Uses ``jax.export``: the returned bytes embed the weights and
        the full TTA/aggregation graph, so any runtime that consumes
        StableHLO (TF serving via jax2tf, IREE, another JAX process via
        ``jax.export.deserialize``) can run inference without flax, the
        model code, or the checkpoint. With ``batch_symbolic`` the
        window-batch dimension is exported symbolically — one artifact
        serves any batch size. Returns the serialized bytes; also
        writes them to ``path`` when given.

        No reference counterpart (research drivers only, SURVEY §0) —
        this is the framework's deployment surface.
        """
        from jax import export as jax_export

        variables = self.variables
        forward = self._raw_forward
        if (
            self.cfg.model.get("attn_impl", "xla") != "xla"
            or self.cfg.model.get("mlp_impl", "xla") != "xla"
        ):
            # Pallas kernels lower to tpu_custom_call, which jax.export
            # refuses to serialize (no compatibility guarantees). The
            # kernels are parity-tested equal to the XLA path, so export
            # through an XLA-impl twin of the same architecture.
            import copy

            cfg = copy.deepcopy(self.cfg)
            cfg.model.attn_impl = "xla"
            cfg.model.mlp_impl = "xla"
            model, _ = instantiate_model(
                cfg, self.skeleton, quant=self.quantized
            )
            forward = self._make_forward(model)

        def fn(x):
            return forward(variables, x)

        j = self.skeleton.num_joints
        x_spec = jax.ShapeDtypeStruct(
            (self.batch_size, self.seq_len, j, 2), jnp.float32
        )
        if batch_symbolic:
            (x_spec,) = jax_export.symbolic_args_specs(
                (x_spec,), "b, _, _, _"
            )
        exported = jax_export.export(jax.jit(fn))(x_spec)
        data = exported.serialize()
        if path is not None:
            with open(path, "wb") as f:
                f.write(bytes(data))
        return bytes(data)

    @staticmethod
    def load_stablehlo(path_or_bytes):
        """Deserialize an :meth:`export_stablehlo` artifact into a
        callable ``f(keypoints (B, L, J, 2)) -> (poses, hyps, scores)``."""
        from jax import export as jax_export

        if isinstance(path_or_bytes, (bytes, bytearray)):
            data = path_or_bytes
        else:
            with open(path_or_bytes, "rb") as f:
                data = f.read()
        exported = jax_export.deserialize(bytearray(data))
        return lambda x: exported.call(jnp.asarray(x, jnp.float32))

    # ------------------------------------------------------------------
    def stream(self, stride: int = 1, lookahead: Optional[int] = None):
        """Open a real-time :class:`~manipose_tpu.streaming.StreamingSession`.

        ``session.push(frames)`` feeds live 2D keypoints and returns 3D
        poses as they clear the ``lookahead`` margin (default
        ``seq_len // 2`` — center-frame quality from the bidirectional
        trunk; ``0`` is fully causal); ``session.flush()`` drains the
        tail. No reference counterpart (offline drivers only) — this is
        the framework's live-serving surface.
        """
        from .streaming import StreamingSession

        return StreamingSession(self, stride=stride, lookahead=lookahead)

    # ------------------------------------------------------------------
    def predict_video(
        self,
        keypoints_2d: np.ndarray,
        return_hypotheses: bool = False,
        window_stride: Optional[int] = None,
    ):
        """(N, J, 2) screen-normalized keypoints -> (N, J, 3) 3D poses
        in meters (root-relative camera frame).

        Windows of ``seq_len`` frames (replicate-padded tail), batched to
        the static ``batch_size`` so every call reuses one compiled graph.
        With ``return_hypotheses=True`` returns a
        ``(poses, hypotheses (W, H, L, J, 3), scores (W, H, L, 1))``
        triple — ``(poses, None, None)`` for non-rMCL models, which have
        no hypothesis axis.

        ``window_stride=S`` (``1 <= S <= ceil(seq_len / 2)``) enables
        the QUALITY mode: overlapping windows advancing S frames, each
        frame read from the trunk's well-conditioned interior
        (center-lookahead) instead of tiling edge-to-edge — measured
        7.8mm better MPJPE than the default tiling on a trained model,
        at ``seq_len / S`` times the compute (BASELINE.md r3).
        Emissions equal a ``stream(stride=S, lookahead=seq_len // 2)``
        session exactly, but windows run batched. Default ``None`` is
        the reference protocol's non-overlapping tiling.
        """
        keypoints_2d = np.asarray(keypoints_2d, np.float32)
        n_frames, j, c = keypoints_2d.shape
        assert n_frames > 0, "empty keypoint video"
        assert j == self.skeleton.num_joints and c == 2
        seq_len = self.seq_len
        if window_stride is not None:
            lookahead = seq_len // 2
            if not 1 <= window_stride <= seq_len - lookahead:
                raise ValueError(
                    f"window_stride={window_stride} must be in "
                    f"[1, {seq_len - lookahead}]"
                )
            n_windows = (n_frames + window_stride - 1) // window_stride
            # same window geometry as StreamingSession: window k ends at
            # frame (k+1)*S + lookahead - 1, indices replicate-clamped
            # to the stream, frames emitted from the center positions
            # [L - lookahead - S, L - lookahead)
            ends = (np.arange(n_windows, dtype=np.int64) + 1) * window_stride
            ends += lookahead - 1
            idx = np.clip(
                ends[:, None] + np.arange(-seq_len + 1, 1)[None, :],
                0,
                n_frames - 1,
            )
            # lazy per-batch gather: materializing all W overlapping
            # windows up-front would blow memory up L/S-fold over the
            # video (1 GB for a 30k-frame flagship run at S=1)
            clips = _LazyWindows(keypoints_2d, idx)
            emit_lo = seq_len - lookahead - window_stride
            emit_hi = emit_lo + window_stride
        else:
            n_windows = max(1, (n_frames + seq_len - 1) // seq_len)
            starts = np.arange(n_windows, dtype=np.int64) * seq_len
            clips = gather_windows(
                [keypoints_2d],
                np.zeros(n_windows, np.int64),
                starts,
                seq_len,
            )  # (W, L, J, 2)
            emit_lo, emit_hi = 0, seq_len

        outs, all_hyps, all_scores = [], [], []

        def harvest(out, n_valid):
            agg, hyps, scores = out
            outs.append(np.asarray(agg[:n_valid, emit_lo:emit_hi]))
            if return_hypotheses and self.rmcl:
                all_hyps.append(np.asarray(hyps[:n_valid]))
                all_scores.append(np.asarray(scores[:n_valid]))

        # depth-1 pipeline: dispatch the next call before pulling the
        # previous outputs (np.asarray is a completion barrier), so the
        # device computes while the host copies
        pending = None
        for b0 in range(0, n_windows, self.batch_size):
            batch = clips[b0 : b0 + self.batch_size]
            n_valid = batch.shape[0]
            if n_valid < self.batch_size:  # pad to the static shape
                pad = np.repeat(
                    batch[-1:], self.batch_size - n_valid, axis=0
                )
                batch = np.concatenate([batch, pad], axis=0)
            out = self._forward(self.variables, jnp.asarray(batch))
            if pending is not None:
                harvest(*pending)
            pending = (out, n_valid)
        if pending is not None:
            harvest(*pending)

        poses = np.concatenate(outs, axis=0).reshape(-1, j, 3)[:n_frames]
        if return_hypotheses:
            if not self.rmcl:
                return poses, None, None
            return (
                poses,
                np.concatenate(all_hyps, axis=0),
                np.concatenate(all_scores, axis=0),
            )
        return poses
