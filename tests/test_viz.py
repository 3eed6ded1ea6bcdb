"""Visualization: render functions produce files; camera->world prep."""

from pathlib import Path

import numpy as np
import pytest

from manipose_tpu.geometry import h36m_skeleton_17
from manipose_tpu.viz import (
    prepare_prediction_for_viz,
    render_animation,
    render_frame_prediction,
    render_rotated_frame_prediction,
)

SKEL = h36m_skeleton_17()
RNG = np.random.default_rng(0)


def _poses(n=4):
    return RNG.normal(scale=0.3, size=(n, 17, 3)).astype(np.float32)


def _hyps(n=4, h=3):
    xyz = RNG.normal(scale=0.3, size=(n, h, 17, 3)).astype(np.float32)
    scores = np.full((n, h, 17, 1), 1.0 / h, np.float32)
    return np.concatenate([xyz, scores], axis=-1)


class TestRender:
    def test_animation_single_and_multihyp(self, tmp_path):
        kps = RNG.uniform(0, 1000, size=(4, 17, 2)).astype(np.float32)
        out = render_animation(
            keypoints=kps,
            poses={"pred": _poses(), "hyps": _hyps()},
            skeleton=SKEL,
            fps=5,
            output=str(tmp_path / "anim.gif"),
            size=2,
        )
        assert (tmp_path / "anim.gif").exists()

    def test_mp4_falls_back_to_gif_without_ffmpeg(self, tmp_path):
        kps = RNG.uniform(0, 1000, size=(2, 17, 2)).astype(np.float32)
        out = render_animation(
            keypoints=kps, poses={"pred": _poses(2)}, skeleton=SKEL,
            fps=5, output=str(tmp_path / "anim.mp4"), size=2,
        )
        assert out.endswith((".mp4", ".gif"))

    def test_frame_prediction(self, tmp_path):
        kps = RNG.uniform(0, 1000, size=(4, 17, 2)).astype(np.float32)
        out = render_frame_prediction(
            kps, {"pred": _poses()}, SKEL, frame_index=1,
            output=str(tmp_path / "frame.png"), size=2,
        )
        assert (tmp_path / "frame.png").exists()

    def test_rotated_frame(self, tmp_path):
        out = render_rotated_frame_prediction(
            _poses(1)[0], SKEL, output=str(tmp_path / "rot.gif"),
            azimuths=[0, 90], size=2,
        )
        assert (tmp_path / "rot.gif").exists()


class TestPrepare:
    def test_prepare_prediction_floor_and_rotation(self):
        from manipose_tpu.data.h36m_cameras import build_cameras

        cam = build_cameras()["S1"][0]
        pred = _poses(6)
        out = prepare_prediction_for_viz(pred, cam)
        # floor at z = 0
        np.testing.assert_allclose(out[..., 2].min(), 0.0, atol=1e-6)
        # rigid transform: pairwise distances preserved
        d_in = np.linalg.norm(pred[0, 1] - pred[0, 2])
        d_out = np.linalg.norm(out[0, 1] - out[0, 2])
        np.testing.assert_allclose(d_in, d_out, rtol=1e-5)

    def test_prepare_multihyp_keeps_scores(self):
        from manipose_tpu.data.h36m_cameras import build_cameras

        cam = build_cameras()["S1"][0]
        hyps = _hyps(5)
        out = prepare_prediction_for_viz(hyps, cam, multihyp=True)
        np.testing.assert_allclose(out[..., 3], hyps[..., 3], atol=1e-7)


class TestVideoOverlay:
    """Input-video overlay path (``visualization.py:18-73,163-180``)."""

    def _toy_inputs(self, n=4, j=17):
        rng = np.random.default_rng(0)
        kps = rng.uniform(100, 900, size=(n, j, 2)).astype(np.float32)
        poses = {"model": rng.normal(size=(n, j, 3)).astype(np.float32)}
        return kps, poses

    def test_load_frames_from_array_skip_and_limit(self):
        from manipose_tpu.viz import load_frames

        frames = np.arange(6)[:, None, None, None] * np.ones(
            (6, 4, 5, 3), np.uint8
        )
        out = load_frames(frames=frames, input_video_skip=2, max_frames=5)
        assert out.shape == (3, 4, 5, 3)
        assert out[0, 0, 0, 0] == 2 and out[-1, 0, 0, 0] == 4

    def test_load_frames_rejects_bad_shape(self):
        from manipose_tpu.viz import load_frames

        with pytest.raises(ValueError):
            load_frames(frames=np.zeros((3, 4, 5), np.uint8))

    def test_render_animation_with_frame_overlay(self, tmp_path):
        from manipose_tpu.geometry import h36m_skeleton_17
        from manipose_tpu.viz import render_animation

        kps, poses = self._toy_inputs()
        frames = np.full((4, 32, 48, 3), 127, np.uint8)
        out = render_animation(
            kps, poses, h36m_skeleton_17(), fps=5,
            output=str(tmp_path / "anim.gif"), input_frames=frames,
        )
        assert Path(out).exists() and Path(out).stat().st_size > 0

    def test_render_animation_trims_to_video_length(self, tmp_path):
        from manipose_tpu.geometry import h36m_skeleton_17
        from manipose_tpu.viz import render_animation

        kps, poses = self._toy_inputs(n=10)
        frames = np.full((3, 16, 16, 3), 10, np.uint8)  # shorter video
        out = render_animation(
            kps, poses, h36m_skeleton_17(), fps=5,
            output=str(tmp_path / "anim2.gif"), input_frames=frames,
        )
        assert Path(out).exists()

    def test_render_frame_prediction_with_overlay(self, tmp_path):
        from manipose_tpu.geometry import h36m_skeleton_17
        from manipose_tpu.viz import render_frame_prediction

        kps, poses = self._toy_inputs()
        frames = np.full((4, 32, 48, 3), 64, np.uint8)
        out = render_frame_prediction(
            kps, poses, h36m_skeleton_17(), frame_index=2,
            output=str(tmp_path / "frame.png"), input_frames=frames,
        )
        assert Path(out).exists() and Path(out).stat().st_size > 0

    def test_read_video_raises_without_ffmpeg(self, monkeypatch):
        from manipose_tpu.viz import video as vid

        monkeypatch.setattr(vid, "ffmpeg_available", lambda: False)
        with pytest.raises(RuntimeError, match="ffmpeg"):
            list(vid.read_video("nonexistent.mp4"))
