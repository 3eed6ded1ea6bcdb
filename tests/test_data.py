"""Data layer: cameras, windowing, miss masks, flip, loader determinism.

Camera-math parity uses the reference torch implementations as oracles.
"""

import numpy as np
import pytest
import torch

from manipose_tpu.data import (
    PoseSequenceDataset,
    SequenceLoader,
    make_miss_mask,
    normalize_screen_coordinates,
    image_coordinates,
    pose_flip,
    project_to_2d,
    world_to_camera,
    camera_to_world,
)
from manipose_tpu.data.h36m_cameras import build_cameras
from manipose_tpu.geometry import h36m_skeleton_17

from conftest import load_ref_module

ref_camera = load_ref_module("mh_so3_hpe.data.camera")

SKEL = h36m_skeleton_17()
RNG = np.random.default_rng(0)


class TestCameras:
    def test_normalize_roundtrip(self):
        x = RNG.uniform(0, 1000, size=(7, 17, 2)).astype(np.float32)
        n = normalize_screen_coordinates(x, w=1000, h=1002)
        ref = ref_camera.normalize_screen_coordinates(x, w=1000, h=1002)
        np.testing.assert_allclose(n, ref, atol=1e-6)
        back = image_coordinates(n, w=1000, h=1002)
        np.testing.assert_allclose(back, x, atol=1e-3)

    def test_world_camera_roundtrip_matches_reference(self):
        cams = build_cameras()
        cam = cams["S1"][0]
        x = RNG.normal(size=(11, 17, 3)).astype(np.float32) + np.asarray(
            [0, 0, 5], np.float32
        )
        ours = world_to_camera(x, R=cam["orientation"], t=cam["translation"])
        ref = ref_camera.world_to_camera(
            x, R=cam["orientation"], t=cam["translation"]
        )
        np.testing.assert_allclose(ours, ref, atol=1e-5)
        back = camera_to_world(ours, R=cam["orientation"], t=cam["translation"])
        np.testing.assert_allclose(back, x, atol=1e-4)

    def test_project_to_2d_matches_reference(self):
        cams = build_cameras()
        cam = cams["S5"][1]
        x = RNG.normal(size=(4, 17, 3)).astype(np.float32)
        x[..., 2] += 5.0
        params = np.broadcast_to(cam["intrinsic"], (4, 9)).astype(np.float32)
        ours = project_to_2d(x, params)
        ref = ref_camera.project_to_2d(
            torch.from_numpy(x), torch.from_numpy(params.copy())
        ).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_camera_tables_match_reference(self):
        """Normalized camera dicts == reference Human36mDataset prep."""
        h36m_lifting = load_ref_module("mh_so3_hpe.data.h36m_lifting")
        import copy

        ref_cams = copy.deepcopy(h36m_lifting.h36m_cameras_extrinsic_params)
        for cameras in ref_cams.values():
            for i, cam in enumerate(cameras):
                cam.update(h36m_lifting.h36m_cameras_intrinsic_params[i])
                for k, v in cam.items():
                    if k not in ["id", "res_w", "res_h"]:
                        cam[k] = np.array(v, dtype="float32")
                cam["center"] = ref_camera.normalize_screen_coordinates(
                    cam["center"], w=cam["res_w"], h=cam["res_h"]
                ).astype("float32")
                cam["focal_length"] = cam["focal_length"] / cam["res_w"] * 2.0
                if "translation" in cam:
                    cam["translation"] = cam["translation"] / 1000
                cam["intrinsic"] = np.concatenate(
                    (cam["center"], cam["focal_length"],
                     cam["radial_distortion"], cam["tangential_distortion"])
                )
        ours = build_cameras()
        for subject, cams in ours.items():
            for i, cam in enumerate(cams):
                ref = ref_cams[subject][i]
                for key in ("center", "focal_length", "radial_distortion",
                            "tangential_distortion", "orientation",
                            "translation"):
                    np.testing.assert_allclose(
                        cam[key], ref[key], atol=1e-6, err_msg=f"{subject}/{i}/{key}"
                    )
                assert cam["res_w"] == ref["res_w"]
                assert cam["res_h"] == ref["res_h"]


class TestFlip:
    def test_flip_is_involution_and_nonmutating(self):
        pose = RNG.normal(size=(5, 17, 3)).astype(np.float32)
        orig = pose.copy()
        (flipped,) = pose_flip((pose,), SKEL)
        np.testing.assert_array_equal(pose, orig)  # input untouched
        assert not np.allclose(flipped, pose)
        (back,) = pose_flip((flipped,), SKEL)
        np.testing.assert_allclose(back, pose, atol=1e-6)

    def test_flip_swaps_left_right(self):
        pose = RNG.normal(size=(2, 17, 2)).astype(np.float32)
        (flipped,) = pose_flip((pose,), SKEL)
        for jl, jr in zip(SKEL.joints_left, SKEL.joints_right):
            np.testing.assert_allclose(flipped[:, jl, 0], -pose[:, jr, 0])
            np.testing.assert_allclose(flipped[:, jl, 1], pose[:, jr, 1])


class TestMissMasks:
    @pytest.mark.parametrize(
        "miss_type",
        ["no_miss", "random", "random_left_arm_right_leg",
         "structured_joint", "structured_frame"],
    )
    def test_mask_shapes_and_semantics(self, miss_type):
        rng = np.random.default_rng(1)
        mask = make_miss_mask(rng, 32, 17, miss_type, 0.25)
        assert mask.shape == (32, 17)
        assert set(np.unique(mask)).issubset({0.0, 1.0})
        if miss_type == "no_miss":
            assert mask.min() == 1.0
        elif miss_type == "structured_frame":
            dropped = np.nonzero((mask == 0).all(axis=1))[0]
            assert len(dropped) == 8  # int(32 * .25) contiguous frames
            assert (np.diff(dropped) == 1).all()
        elif miss_type == "structured_joint":
            assert (mask[:, [0, 4, 5]] == 1).all()  # only right leg drops
            assert (mask == 0).any(), "no keypoint was actually dropped"
            dropped_frames = np.nonzero((mask == 0).any(axis=1))[0]
            assert len(dropped_frames) == 8  # int(32 * .25) frames
        elif miss_type == "random":
            assert (mask == 0).any(), "no keypoint was actually dropped"
        elif miss_type == "random_left_arm_right_leg":
            assert (mask == 0).sum() == 8 * 6  # floor(.25*32) frames x 6 joints


def _toy_videos(n_videos=3, frames=(50, 61, 40), J=17):
    rng = np.random.default_rng(2)
    p3 = [rng.normal(size=(f, J, 3)).astype(np.float32) for f in frames]
    p2 = [rng.normal(size=(f, J, 2)).astype(np.float32) for f in frames]
    return p3, p2


class TestWindowing:
    def test_index_tables_drop_last(self):
        p3, p2 = _toy_videos()
        ds = PoseSequenceDataset(p3, p2, seq_len=16, drop_last=True)
        # 50//16 + 61//16 + 40//16 = 3 + 3 + 2
        assert len(ds) == 8
        ds_pad = PoseSequenceDataset(p3, p2, seq_len=16, drop_last=False)
        assert len(ds_pad) == 11

    def test_sequential_windows_cover_in_order(self):
        p3, p2 = _toy_videos()
        ds = PoseSequenceDataset(p3, p2, seq_len=16, random_start=False)
        c2, c3 = ds.get(1)
        np.testing.assert_array_equal(c3, p3[0][16:32])
        np.testing.assert_array_equal(c2, p2[0][16:32])

    def test_replicate_padding(self):
        p3, p2 = _toy_videos(frames=(20,))
        ds = PoseSequenceDataset(p3, p2, seq_len=16, drop_last=False)
        assert len(ds) == 2
        c2, c3 = ds.get(1)
        assert c3.shape == (16, 17, 3)
        # frames 16..19 real, rest replicate of frame 19
        np.testing.assert_array_equal(c3[:4], p3[0][16:20])
        np.testing.assert_array_equal(c3[4:], np.repeat(p3[0][19:20], 12, 0))

    def test_random_start_within_bounds(self):
        p3, p2 = _toy_videos()
        ds = PoseSequenceDataset(p3, p2, seq_len=16, random_start=True)
        rng = np.random.default_rng(3)
        for _ in range(20):
            c2, c3 = ds.get(0, rng)
            assert c3.shape == (16, 17, 3)


class TestLoader:
    def test_static_shapes_and_valid_mask(self):
        p3, p2 = _toy_videos()
        ds = PoseSequenceDataset(p3, p2, seq_len=16)
        loader = SequenceLoader(ds, batch_size=3, shuffle=False, seed=0)
        batches = list(loader)
        assert len(batches) == 3  # ceil(8 / 3)
        for b in batches:
            assert b.pose_2d.shape == (3, 16, 17, 2)
            assert b.pose_3d.shape == (3, 16, 17, 3)
        assert batches[-1].valid.sum() == 2  # 8 = 3+3+2

    def test_shuffle_deterministic_per_epoch(self):
        p3, p2 = _toy_videos()
        ds = PoseSequenceDataset(p3, p2, seq_len=16)
        l1 = SequenceLoader(ds, batch_size=4, shuffle=True, seed=7)
        l2 = SequenceLoader(ds, batch_size=4, shuffle=True, seed=7)
        b1 = next(iter(l1))
        b2 = next(iter(l2))
        np.testing.assert_array_equal(b1.pose_3d, b2.pose_3d)
        # different epoch -> different order
        l2.set_epoch(1)
        b3 = next(iter(l2))
        assert not np.array_equal(b1.pose_3d, b3.pose_3d)


class TestLegacyGenerators:
    def test_pose_generator(self):
        from manipose_tpu.data.chunked import PoseGenerator

        p3, p2 = _toy_videos()
        actions = [["a"] * v.shape[0] for v in p3]
        cams = [np.zeros((v.shape[0], 4), np.float32) for v in p3]
        gen = PoseGenerator(p3, p2, actions, cams)
        assert len(gen) == sum(v.shape[0] for v in p3)
        out3, out2 = gen[0]
        np.testing.assert_array_equal(out3, p3[0][0])
        np.testing.assert_array_equal(out2, p2[0][0])

    def test_chunked_generator_padding_and_flip(self):
        from manipose_tpu.data.chunked import ChunkedGenerator
        from manipose_tpu.geometry import h36m_skeleton_17

        skel = h36m_skeleton_17()
        rng = np.random.default_rng(5)
        p3 = {"TS1": rng.normal(size=(21, 17, 3)).astype(np.float32)}
        p2 = {"TS1": rng.normal(size=(21, 17, 2)).astype(np.float32)}
        gen = ChunkedGenerator(
            batch_size=4, cameras=None, poses_3d=p3, poses_2d=p2,
            chunk_length=9, pad=2, augment=True,
            kps_left=skel.joints_left, kps_right=skel.joints_right,
            joints_left=skel.joints_left, joints_right=skel.joints_right,
        )
        batches = list(gen)
        assert gen.num_frames() == 21
        total = sum(b[1].shape[0] for b in batches)
        # 3 chunks x 2 variants (plain + flip)
        assert total == 6
        _, b3, b2, keys = batches[0]
        assert b2.shape[1] == 9 + 2 * 2  # chunk + 2*pad
        assert b3.shape[1] == 9
        assert keys[0] == "TS1"


class TestBackProjection:
    def test_uvd2xyz_matches_reference(self):
        import torch

        rng = np.random.default_rng(9)
        N, T, V = 2, 5, 17
        uvd = rng.normal(size=(N, T, V, 3)).astype(np.float32)
        f = rng.uniform(1.0, 2.0, size=(N, T)).astype(np.float32)
        c = rng.normal(size=(N, T, 2)).astype(np.float32)
        cam_dist = rng.uniform(4.0, 6.0, size=(N, T)).astype(np.float32)

        from manipose_tpu.data import uvd2xyz

        ours = uvd2xyz(uvd, f, c, cam_dist)
        ref = ref_camera.uvd2xyz(
            torch.from_numpy(uvd), torch.from_numpy(f),
            torch.from_numpy(c), torch.from_numpy(cam_dist),
        ).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_uvd2xyz_from_cam_matches_reference(self):
        import torch

        rng = np.random.default_rng(10)
        N, T, V = 2, 4, 17
        uvd = rng.normal(size=(N, T, V, 3)).astype(np.float32)
        q = rng.normal(size=(N, T, 4)).astype(np.float32)
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        cam = np.concatenate(
            [
                rng.uniform(1, 2, size=(N, T, 9)).astype(np.float32),
                q,
                rng.normal(size=(N, T, 3)).astype(np.float32),
            ],
            axis=-1,
        )
        from manipose_tpu.data import uvd2xyz_from_cam

        ours = uvd2xyz_from_cam(uvd, cam)
        ref = ref_camera.uvd2xyz_from_cam(
            torch.from_numpy(uvd), torch.from_numpy(cam)
        ).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-4)


class TestBatchPathMissTypes:
    @pytest.mark.parametrize("miss_type", ["random", "all", "noisy",
                                           "structured_frame"])
    def test_get_batch_miss_types(self, miss_type):
        p3, p2 = _toy_videos()
        ds = PoseSequenceDataset(
            p3, p2, seq_len=16, miss_type=miss_type, miss_rate=0.25,
            noise_sigma=0.1,
        )
        rng = np.random.default_rng(0)
        b2, b3 = ds.get_batch(np.arange(4), rng)
        assert b2.shape == (4, 16, 17, 2)
        assert b3.shape == (4, 16, 17, 3)
        if miss_type == "random":
            # some keypoints zeroed
            zeros = (b2 == 0).all(axis=-1).mean()
            assert 0.1 < zeros < 0.4

    def test_get_batch_flip_applies_to_both(self):
        p3, p2 = _toy_videos()
        ds = PoseSequenceDataset(
            p3, p2, seq_len=16, skeleton=SKEL, flip_probability=1.0
        )
        rng = np.random.default_rng(0)
        b2, b3 = ds.get_batch(np.asarray([0]), rng)
        raw2, raw3 = p2[0][:16], p3[0][:16]
        (f2, f3) = pose_flip((raw2, raw3), SKEL)
        np.testing.assert_allclose(b2[0], f2, atol=1e-6)
        np.testing.assert_allclose(b3[0], f3, atol=1e-6)
