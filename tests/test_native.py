"""Native C++ windowing core vs the numpy fallback."""

import numpy as np
import pytest

from manipose_tpu.data import native


@pytest.fixture(scope="module")
def lib():
    return native.load_library()


def _videos():
    rng = np.random.default_rng(0)
    return [
        rng.normal(size=(n, 17, 3)).astype(np.float32) for n in (40, 25, 33)
    ]


class TestNativeWindowing:
    def test_library_builds(self, lib):
        assert lib is not None, "g++ build of native/windowing.cpp failed"

    def test_gather_matches_numpy(self, lib):
        videos = _videos()
        rng = np.random.default_rng(1)
        n_windows = 16
        video_idx = rng.integers(0, len(videos), size=n_windows)
        start = np.asarray(
            [rng.integers(0, videos[v].shape[0] - 4) for v in video_idx]
        )
        out = native.gather_windows(videos, video_idx, start, seq_len=8)
        for w in range(n_windows):
            v = videos[video_idx[w]]
            s = int(start[w])
            clip = v[s : s + 8]
            if clip.shape[0] < 8:
                clip = np.concatenate(
                    [clip, np.repeat(v[-1:], 8 - clip.shape[0], axis=0)]
                )
            np.testing.assert_array_equal(out[w], clip)

    def test_replicate_padding_past_end(self, lib):
        videos = _videos()
        out = native.gather_windows(
            videos,
            np.asarray([0], np.int64),
            np.asarray([36], np.int64),  # 40-frame video, window of 8
            seq_len=8,
        )
        np.testing.assert_array_equal(out[0, :4], videos[0][36:40])
        np.testing.assert_array_equal(
            out[0, 4:], np.repeat(videos[0][-1:], 4, axis=0)
        )

    def test_apply_masks_matches_numpy(self, lib):
        rng = np.random.default_rng(2)
        batch = rng.normal(size=(4, 8, 17, 2)).astype(np.float32)
        masks = (rng.uniform(size=(4, 8, 17)) > 0.3).astype(np.float32)
        expected = batch * masks[..., None]
        out = native.apply_masks(batch.copy(), masks)
        np.testing.assert_array_equal(out, expected)

    def test_large_batch_multithreaded(self, lib):
        videos = [_videos()[0]]
        n = 512
        idx = np.zeros(n, np.int64)
        start = np.tile(np.arange(0, 32, 2, dtype=np.int64), n // 16)
        out = native.gather_windows(videos, idx, start, seq_len=8, n_threads=8)
        assert out.shape == (n, 8, 17, 3)
        np.testing.assert_array_equal(out[0], videos[0][0:8])
