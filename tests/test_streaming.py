"""Streaming inference: equivalence with the offline path and with a
direct per-window oracle, incremental-push invariance, edge cases."""

import jax.numpy as jnp
import numpy as np
import pytest

from manipose_tpu.config import load_config
from manipose_tpu.serving import Predictor

SEQ_LEN = 9
OVERRIDES = [
    f"data.seq_len={SEQ_LEN}",
    "model.layers=2", "model.channels=32", "model.nheads=4",
    "model.layers_seg=2", "model.channels_seg=16", "model.nheads_seg=4",
    "multi_hyp.n_hyp=2",
]


@pytest.fixture(scope="module")
def predictor():
    cfg = load_config("config", overrides=OVERRIDES)
    return Predictor(cfg=cfg, batch_size=3, tta=True)


def stream_all(predictor, video, stride, lookahead, chunk=1):
    sess = predictor.stream(stride=stride, lookahead=lookahead)
    outs = []
    for i in range(0, len(video), chunk):
        outs.append(sess.push(video[i : i + chunk]))
    outs.append(sess.flush())
    return np.concatenate(outs, axis=0)


def oracle(predictor, video, stride, lookahead):
    """Per-block expected output built directly from the forward pass:
    block k's window ends at frame (k+1)*stride + lookahead - 1, indices
    clamped to the stream (replicate padding both ends)."""
    n = len(video)
    L, S, D = predictor.seq_len, stride, lookahead
    out = []
    for k in range((n + S - 1) // S):
        end = (k + 1) * S + D - 1
        idx = np.clip(np.arange(end - L + 1, end + 1), 0, n - 1)
        window = video[idx][None]
        agg, _, _ = predictor._forward(predictor.variables, jnp.asarray(window))
        lo = L - D - S
        out.append(np.asarray(agg[0, lo : lo + S]))
    return np.concatenate(out, axis=0)[:n]


class TestStreaming:
    def test_offline_equivalence(self):
        """stride=seq_len, lookahead=0 reproduces predict_video exactly
        (same non-overlapping windows, same replicate tail padding).
        batch_size=1 so offline and streaming run the IDENTICAL compiled
        graph — the match is bit-exact, not a tolerance."""
        cfg = load_config("config", overrides=OVERRIDES)
        p1 = Predictor(cfg=cfg, batch_size=1, tta=True)
        rng = np.random.default_rng(0)
        for n in (4, SEQ_LEN, 2 * SEQ_LEN, 25):
            video = rng.normal(size=(n, 17, 2)).astype(np.float32)
            offline = p1.predict_video(video)
            streamed = stream_all(p1, video, SEQ_LEN, 0)
            np.testing.assert_array_equal(streamed, offline)

    @pytest.mark.parametrize(
        "stride,lookahead", [(1, 0), (1, 4), (3, 2), (2, SEQ_LEN - 2)]
    )
    def test_matches_oracle(self, predictor, stride, lookahead):
        rng = np.random.default_rng(1)
        video = rng.normal(size=(20, 17, 2)).astype(np.float32)
        got = stream_all(predictor, video, stride, lookahead)
        assert got.shape == (20, 17, 3)
        np.testing.assert_allclose(
            got, oracle(predictor, video, stride, lookahead), atol=1e-6
        )

    def test_chunked_pushes_match_single_frames(self, predictor):
        rng = np.random.default_rng(2)
        video = rng.normal(size=(17, 17, 2)).astype(np.float32)
        a = stream_all(predictor, video, 2, 3, chunk=1)
        b = stream_all(predictor, video, 2, 3, chunk=5)
        c = stream_all(predictor, video, 2, 3, chunk=17)
        np.testing.assert_allclose(a, b, atol=0)
        np.testing.assert_allclose(a, c, atol=0)

    def test_short_stream_inside_lookahead(self, predictor):
        """A stream shorter than the lookahead still gets every frame
        predicted at flush."""
        rng = np.random.default_rng(3)
        video = rng.normal(size=(2, 17, 2)).astype(np.float32)
        got = stream_all(predictor, video, 3, 4)
        assert got.shape == (2, 17, 3)
        np.testing.assert_allclose(got, oracle(predictor, video, 3, 4), atol=1e-6)

    def test_latency_property_and_validation(self, predictor):
        sess = predictor.stream(stride=2, lookahead=3)
        assert sess.latency_frames == 4
        with pytest.raises(ValueError, match="lookahead"):
            predictor.stream(lookahead=SEQ_LEN)
        with pytest.raises(ValueError, match="stride"):
            predictor.stream(stride=SEQ_LEN, lookahead=1)
        with pytest.raises(ValueError, match="frames"):
            sess.push(np.zeros((3, 5, 2), np.float32))

    def test_flush_closes_session(self, predictor):
        sess = predictor.stream()
        sess.push(np.zeros((3, 17, 2), np.float32))
        sess.flush()
        with pytest.raises(RuntimeError):
            sess.push(np.zeros((17, 2), np.float32))
        with pytest.raises(RuntimeError):
            sess.flush()

    def test_default_lookahead_is_center(self, predictor):
        sess = predictor.stream()
        assert sess.lookahead == SEQ_LEN // 2

    def test_quality_mode_matches_center_stream(self):
        """predict_video(window_stride=S) — batched overlapping windows,
        center emission — must equal a stream(stride=S,
        lookahead=L//2) session bit-for-bit (batch_size=1: identical
        compiled graph)."""
        cfg = load_config("config", overrides=OVERRIDES)
        p1 = Predictor(cfg=cfg, batch_size=1, tta=True)
        rng = np.random.default_rng(5)
        for n in (3, 20, 2 * SEQ_LEN):
            video = rng.normal(size=(n, 17, 2)).astype(np.float32)
            for stride in (1, 3, SEQ_LEN - SEQ_LEN // 2):
                batched = p1.predict_video(video, window_stride=stride)
                streamed = stream_all(
                    p1, video, stride, SEQ_LEN // 2
                )
                np.testing.assert_array_equal(batched, streamed)
        with pytest.raises(ValueError, match="window_stride"):
            p1.predict_video(video, window_stride=SEQ_LEN)

    def test_data_parallel_predictor_streams(self, predictor):
        """A DP predictor's forward is compiled with the batch sharded
        over the mesh; streaming must pad its batch-of-1 window up to
        the static batch instead of crashing on the sharding divisor."""
        import jax

        cfg = load_config("config", overrides=OVERRIDES)
        dp = Predictor(
            cfg=cfg, batch_size=len(jax.devices()), tta=True,
            data_parallel=True,
        )
        rng = np.random.default_rng(4)
        video = rng.normal(size=(2 * SEQ_LEN, 17, 2)).astype(np.float32)
        got = stream_all(dp, video, stride=3, lookahead=2)
        assert got.shape == (2 * SEQ_LEN, 17, 3)
        # same weights (same cfg seed): must match the single-device
        # session up to cross-graph float noise
        ref = stream_all(predictor, video, stride=3, lookahead=2)
        np.testing.assert_allclose(got, ref, atol=1e-4)
