"""Serving API: windowing + fixed-shape inference + checkpoint loading."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from manipose_tpu.config import load_config
from manipose_tpu.serving import Predictor

OVERRIDES = [
    "data.seq_len=9",
    "model.layers=2", "model.channels=32", "model.nheads=4",
    "model.layers_seg=2", "model.channels_seg=16", "model.nheads_seg=4",
    "multi_hyp.n_hyp=2",
]


@pytest.fixture(scope="module")
def predictor():
    cfg = load_config("config", overrides=OVERRIDES)
    return Predictor(cfg=cfg, batch_size=3, tta=True)


class TestPredictor:
    def test_predict_video_shapes(self, predictor):
        rng = np.random.default_rng(0)
        video = rng.normal(size=(40, 17, 2)).astype(np.float32)
        poses = predictor.predict_video(video)
        assert poses.shape == (40, 17, 3)
        assert np.isfinite(poses).all()

    def test_short_video_padding(self, predictor):
        rng = np.random.default_rng(1)
        video = rng.normal(size=(5, 17, 2)).astype(np.float32)  # < seq_len
        poses = predictor.predict_video(video)
        assert poses.shape == (5, 17, 3)

    def test_hypotheses_output(self, predictor):
        rng = np.random.default_rng(2)
        video = rng.normal(size=(20, 17, 2)).astype(np.float32)
        poses, hyps, scores = predictor.predict_video(
            video, return_hypotheses=True
        )
        assert poses.shape == (20, 17, 3)
        assert hyps.shape[1] == 2 and hyps.shape[-1] == 3  # (W, H, L, J, 3)
        np.testing.assert_allclose(scores.sum(axis=1), 1.0, atol=1e-5)

    def test_tta_semantics_pinned(self, predictor):
        """The serving forward must equal the explicit two-applies TTA
        form (the reference's semantics, eval_utils.py:78-142) — pins
        the math against refactors (e.g. the measured-and-rejected
        fused-2B-batch variant, BASELINE.md r3)."""
        from manipose_tpu.eval.engine import flip_poses
        from manipose_tpu.models.rmcl import aggregate_hypotheses

        rng = np.random.default_rng(7)
        x = jnp.asarray(rng.normal(size=(3, 9, 17, 2)).astype(np.float32))
        model, skeleton = predictor.model, predictor.skeleton

        def two_call(variables, x):
            hyps, scores = model.apply(variables, x, deterministic=True)
            agg = aggregate_hypotheses(hyps, scores, "weighted_ave")
            f_hyps, f_scores = model.apply(
                variables, flip_poses(x, skeleton), deterministic=True
            )
            f_agg = aggregate_hypotheses(f_hyps, f_scores, "weighted_ave")
            return (agg + flip_poses(f_agg, skeleton)) / 2, hyps, scores

        ref_agg, ref_hyps, ref_scores = two_call(predictor.variables, x)
        agg, hyps, scores = predictor._forward(predictor.variables, x)
        np.testing.assert_allclose(np.asarray(agg), np.asarray(ref_agg),
                                   atol=2e-5)
        np.testing.assert_allclose(np.asarray(hyps), np.asarray(ref_hyps),
                                   atol=2e-5)
        np.testing.assert_allclose(np.asarray(scores),
                                   np.asarray(ref_scores), atol=2e-5)

    def test_no_recompile_across_videos(self, predictor):
        """Different video lengths reuse the one compiled graph."""
        import jax

        rng = np.random.default_rng(3)
        predictor.predict_video(rng.normal(size=(13, 17, 2)).astype(np.float32))
        compiles_before = predictor._forward._cache_size()
        predictor.predict_video(rng.normal(size=(31, 17, 2)).astype(np.float32))
        predictor.predict_video(rng.normal(size=(7, 17, 2)).astype(np.float32))
        assert predictor._forward._cache_size() == compiles_before

    def test_from_torch_checkpoint_matches_reference(self, tmp_path):
        """Serve the converted reference model; outputs match the torch
        forward through the full predict path (single window, no TTA)."""
        import torch

        import jax
        import jax.numpy as jnp

        from conftest import install_reference_stubs, load_ref_module
        from test_geometry import _reference_h36m_17

        install_reference_stubs()
        ref_rmcl = load_ref_module(
            "mh_so3_hpe.architectures.rmcl_manifold_mix_ste"
        )
        torch.manual_seed(0)
        tmodel = ref_rmcl.RMCLManifoldMixSTE(
            skeleton=_reference_h36m_17(), num_frame=9, num_joints=17,
            num_bones=16, embed_dim_rot=32, depth_rot=2, num_heads_rot=4,
            embed_dim_seg=16, depth_seg=2, num_heads_seg=4, n_hyp=2,
        )
        tmodel.eval()
        ckpt = tmp_path / "ref.pth"
        torch.save(tmodel.state_dict(), ckpt)

        cfg = load_config("config", overrides=OVERRIDES)
        pred = Predictor.from_torch_checkpoint(
            ckpt, cfg=cfg, batch_size=1, tta=False
        )
        rng = np.random.default_rng(4)
        video = rng.normal(size=(9, 17, 2)).astype(np.float32)
        ours = pred.predict_video(video)

        with torch.no_grad():
            hyps, scores = tmodel(torch.from_numpy(video[None]))
            ref = (hyps * scores.unsqueeze(-1)).sum(dim=1)[0].numpy()
        np.testing.assert_allclose(ours, ref, atol=5e-5)


class TestInt8Serving:
    """int8 weight+activation serving path (ops/quant.py)."""

    def test_from_orbax_checkpoint_with_quantize(self, tmp_path):
        """quantize=True must restore the FLOAT checkpoint first and
        quantize after (the quantized tree has a different structure, so
        restoring into it is impossible)."""
        from manipose_tpu.train.checkpoint import save_checkpoint

        cfg = load_config("config", overrides=OVERRIDES)
        source = Predictor(cfg=cfg, batch_size=2, tta=False)
        save_checkpoint(tmp_path, "best_val", source.variables, block=True)

        loaded = Predictor.from_checkpoint(
            tmp_path, tag="best_val", cfg=cfg, batch_size=2, tta=False,
            quantize="force",
        )
        assert loaded.quantized
        rng = np.random.default_rng(5)
        video = rng.normal(size=(18, 17, 2)).astype(np.float32)
        ref = source.predict_video(video)
        out = loaded.predict_video(video)
        assert out.shape == ref.shape
        # int8 trunk: close to the float predictor restored from the
        # same checkpoint, not exact
        assert np.isfinite(out).all()
        assert np.abs(out - ref).max() < 0.2 * max(np.abs(ref).max(), 1e-3)

    def test_return_hypotheses_on_non_rmcl_returns_none_triple(self):
        cfg = load_config(
            "config", overrides=OVERRIDES + ["model.arch=mixste"]
        )
        p = Predictor(cfg=cfg, batch_size=2, tta=False)
        video = np.zeros((9, 17, 2), np.float32)
        poses, hyps, scores = p.predict_video(video, return_hypotheses=True)
        assert poses.shape == (9, 17, 3)
        assert hyps is None and scores is None

    def test_quantized_trunk_close_to_float(self):
        import dataclasses

        from manipose_tpu.models import MixSTE, MixSTEConfig
        from manipose_tpu.ops.quant import quantize_params

        cfg = MixSTEConfig(num_frame=27, num_joints=17, embed_dim=64,
                           depth=4, num_heads=8, drop_path_rate=0.0)
        model = MixSTE(cfg)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(2, 27, 17, 2)).astype(np.float32))
        v_fp = model.init(jax.random.PRNGKey(0), x)
        qmodel = MixSTE(dataclasses.replace(cfg, quant=True))
        v_q = quantize_params(v_fp)
        # quantized param layout == the quant model's own init layout
        v_q_init = qmodel.init(jax.random.PRNGKey(0), x)
        assert jax.tree_util.tree_structure(v_q) == (
            jax.tree_util.tree_structure(v_q_init)
        )
        o_fp = np.asarray(model.apply(v_fp, x, deterministic=True))
        o_q = np.asarray(qmodel.apply(v_q, x, deterministic=True))
        rel = np.linalg.norm(o_q - o_fp) / np.linalg.norm(o_fp)
        assert rel < 0.05, rel

    def test_quantized_predictor_end_to_end(self):
        from manipose_tpu.config import load_config
        from manipose_tpu.serving import Predictor

        cfg = load_config("config", overrides=[
            "model.arch=rmcl_manifold", "model.channels=32",
            "model.layers=2", "model.nheads=4", "model.channels_seg=16",
            "model.layers_seg=2", "model.nheads_seg=4", "data.seq_len=9",
            "multi_hyp.n_hyp=2", "model.drop_path_rate=0.0",
        ])
        fp = Predictor(cfg=cfg, batch_size=2, tta=True)
        q = Predictor(cfg=cfg, batch_size=2, tta=True, quantize="force",
                      variables=fp.variables)
        kps = np.random.default_rng(0).normal(
            size=(20, 17, 2)
        ).astype(np.float32)
        p_fp = fp.predict_video(kps)
        p_q = q.predict_video(kps)
        assert p_q.shape == p_fp.shape == (20, 17, 3)
        assert np.isfinite(p_q).all()
        # (aggregated + TTA-averaged predictions are off-manifold by
        # construction — convex combinations of FK poses — so no MPSCE
        # check here; per-hypothesis consistency is covered elsewhere)
        # quantized predictions stay close to the float ones
        rel = np.linalg.norm(p_q - p_fp) / (np.linalg.norm(p_fp) + 1e-9)
        assert rel < 0.2, rel


class TestInt8Gating:
    """VERDICT r2 #7: quantize=True microprobes the device's actual
    int8-vs-bf16 GEMM rate and falls back (with a warning) when int8
    would regress throughput."""

    def _cfg(self):
        return load_config("config", overrides=OVERRIDES)

    def test_falls_back_when_int8_not_faster(self, monkeypatch):
        import warnings

        from manipose_tpu.ops import quant

        Predictor._int8_probe_cache = None
        monkeypatch.setattr(quant, "int8_speedup", lambda **kw: 0.95)
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            p = Predictor(cfg=self._cfg(), batch_size=2, tta=False,
                          quantize=True)
        assert not p.quantized
        assert any("not faster" in str(w.message) for w in caught)
        # the float path still serves
        video = np.zeros((9, 17, 2), np.float32)
        assert p.predict_video(video).shape == (9, 17, 3)
        Predictor._int8_probe_cache = None

    def test_quantizes_when_int8_wins(self, monkeypatch):
        from manipose_tpu.ops import quant

        Predictor._int8_probe_cache = None
        monkeypatch.setattr(quant, "int8_speedup", lambda **kw: 1.8)
        p = Predictor(cfg=self._cfg(), batch_size=2, tta=False,
                      quantize=True)
        assert p.quantized
        Predictor._int8_probe_cache = None

    def test_force_skips_probe(self, monkeypatch):
        from manipose_tpu.ops import quant

        Predictor._int8_probe_cache = None

        def boom(**kw):
            raise AssertionError("probe must not run under force")

        monkeypatch.setattr(quant, "int8_speedup", boom)
        p = Predictor(cfg=self._cfg(), batch_size=2, tta=False,
                      quantize="force")
        assert p.quantized

    def test_probe_runs_once_per_process(self, monkeypatch):
        from manipose_tpu.ops import quant

        Predictor._int8_probe_cache = None
        calls = []

        def probe(**kw):
            calls.append(1)
            return 1.8

        monkeypatch.setattr(quant, "int8_speedup", probe)
        Predictor(cfg=self._cfg(), batch_size=2, tta=False, quantize=True)
        Predictor(cfg=self._cfg(), batch_size=2, tta=False, quantize=True)
        assert len(calls) == 1
        Predictor._int8_probe_cache = None


class TestStableHLOExport:
    def test_export_roundtrip_symbolic_batch(self, predictor, tmp_path):
        """export_stablehlo -> deserialize -> call must reproduce the
        live forward at MULTIPLE batch sizes from one artifact (the
        window-batch dim is exported symbolically), proving the
        artifact is self-contained (weights + TTA + aggregation)."""
        path = tmp_path / "manipose.stablehlo"
        data = predictor.export_stablehlo(path)
        assert path.stat().st_size == len(data) > 10_000

        f = Predictor.load_stablehlo(path)
        rng = np.random.default_rng(7)
        for b in (3, 5):  # == batch_size and a different symbolic value
            x = rng.normal(size=(b, 9, 17, 2)).astype(np.float32)
            agg, hyps, scores = f(x)
            ref_agg, ref_hyps, ref_scores = predictor._forward(
                predictor.variables, jnp.asarray(x)
            )
            assert agg.shape == (b, 9, 17, 3)
            assert hyps.shape == (b, 2, 9, 17, 3)  # n_hyp=2
            # a different compilation of the same graph: reduction-order
            # noise only
            np.testing.assert_allclose(
                np.asarray(agg), np.asarray(ref_agg), atol=1e-5
            )
            np.testing.assert_allclose(
                np.asarray(scores), np.asarray(ref_scores), atol=1e-5
            )

    def test_export_fixed_batch(self, predictor, tmp_path):
        data = predictor.export_stablehlo(batch_symbolic=False)
        f = Predictor.load_stablehlo(data)
        rng = np.random.default_rng(8)
        x = rng.normal(size=(3, 9, 17, 2)).astype(np.float32)
        agg, _, _ = f(x)
        assert agg.shape == (3, 9, 17, 3)
        # wrong batch size must be rejected, not silently miscomputed
        with pytest.raises(Exception):
            f(rng.normal(size=(4, 9, 17, 2)).astype(np.float32))

    def test_export_mixste_arch(self, tmp_path):
        """Non-rMCL export: the (poses, None, None) return pytree must
        survive serialization (None legs are empty pytree nodes)."""
        cfg = load_config(
            "config", overrides=OVERRIDES + ["model.arch=mixste"]
        )
        p = Predictor(cfg=cfg, batch_size=2, tta=True)
        f = Predictor.load_stablehlo(p.export_stablehlo())
        rng = np.random.default_rng(9)
        x = rng.normal(size=(4, 9, 17, 2)).astype(np.float32)
        agg, hyps, scores = f(x)
        assert hyps is None and scores is None
        np.testing.assert_allclose(
            np.asarray(agg),
            np.asarray(p._forward(p.variables, jnp.asarray(x))[0]),
            atol=1e-5,
        )

    def test_export_pallas_config_falls_back_to_xla(self):
        """Pallas kernels lower to tpu_custom_call, which jax.export
        refuses; export must route through the parity-tested XLA twin
        instead of failing."""
        cfg_pallas = load_config(
            "config",
            overrides=OVERRIDES
            + ["model.mlp_impl=pallas", "model.attn_impl=pallas"],
        )
        cfg_xla = load_config("config", overrides=OVERRIDES)
        base = Predictor(cfg=cfg_xla, batch_size=2, tta=True)
        p = Predictor(
            cfg=cfg_pallas, variables=base.variables, batch_size=2,
            tta=True,
        )
        f = Predictor.load_stablehlo(p.export_stablehlo())
        rng = np.random.default_rng(10)
        x = rng.normal(size=(2, 9, 17, 2)).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(f(x)[0]),
            np.asarray(base._forward(base.variables, jnp.asarray(x))[0]),
            atol=1e-5,
        )


class TestDataParallelServing:
    def test_sharded_matches_single_device(self):
        """data_parallel=True shards the window batch over the 8
        virtual devices; outputs must match the single-device path."""
        cfg = load_config("config", overrides=OVERRIDES)
        base = Predictor(cfg=cfg, batch_size=8, tta=True)
        dp = Predictor(
            cfg=cfg, variables=base.variables, batch_size=8, tta=True,
            data_parallel=True,
        )
        assert dp.mesh is not None and dp.mesh.shape["data"] == 8
        rng = np.random.default_rng(11)
        video = rng.normal(size=(50, 17, 2)).astype(np.float32)
        np.testing.assert_allclose(
            dp.predict_video(video), base.predict_video(video), atol=2e-5
        )

    def test_batch_must_divide_devices(self):
        cfg = load_config("config", overrides=OVERRIDES)
        # ValueError (not assert): the guard must survive python -O
        with pytest.raises(ValueError, match="must divide"):
            Predictor(cfg=cfg, batch_size=3, data_parallel=True)


class TestFromAny:
    """Predictor.from_any: the single dispatch every CLI tool routes
    through (review r3: four hand-rolled variants had already drifted)."""

    def test_pth_routes_to_torch_converter(self, monkeypatch):
        calls = {}
        def fake_torch(cls, path, cfg=None, **kw):
            calls["torch"] = (path, kw)
            return "T"

        monkeypatch.setattr(
            Predictor, "from_torch_checkpoint", classmethod(fake_torch)
        )
        out = Predictor.from_any("/some/manipose_h36m.pth", batch_size=4)
        assert out == "T"
        assert calls["torch"][0].endswith(".pth")
        assert calls["torch"][1]["batch_size"] == 4

    def test_directory_routes_to_orbax(self, monkeypatch):
        calls = {}
        def fake_orbax(cls, d, tag="best_val", cfg=None, **kw):
            calls["orbax"] = (d, tag)
            return "O"

        monkeypatch.setattr(
            Predictor, "from_checkpoint", classmethod(fake_orbax)
        )
        out = Predictor.from_any("/runs/exp1", tag="best_mpjpe")
        assert out == "O"
        assert calls["orbax"] == ("/runs/exp1", "best_mpjpe")

    def test_empty_warns_and_uses_random_weights(self):
        cfg = load_config("config", overrides=OVERRIDES)
        with pytest.warns(UserWarning, match="random weights"):
            p = Predictor.from_any("", cfg=cfg, batch_size=2, tta=False)
        assert isinstance(p, Predictor)
        assert p.batch_size == 2
