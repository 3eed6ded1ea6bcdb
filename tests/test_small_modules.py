"""Direct unit coverage for the small leaf modules: quaternion ops,
seeding helpers, toy datasets and toy plot utilities."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from manipose_tpu.data.quaternion import qinverse, qrot
from manipose_tpu.utils.seeding import epoch_rng, set_random_seeds


class TestQuaternion:
    def _random_unit_q(self, rng, shape):
        q = rng.normal(size=shape + (4,))
        return q / np.linalg.norm(q, axis=-1, keepdims=True)

    def test_qrot_matches_scipy(self):
        rng = np.random.default_rng(0)
        q = self._random_unit_q(rng, (64,))
        v = rng.normal(size=(64, 3))
        got = qrot(q, v)
        # scipy uses (x, y, z, w); ours is (w, x, y, z) like the reference
        want = Rotation.from_quat(q[:, [1, 2, 3, 0]]).apply(v)
        np.testing.assert_allclose(got, want, atol=1e-12)

    def test_qinverse_roundtrip(self):
        rng = np.random.default_rng(1)
        q = self._random_unit_q(rng, (5, 7))
        v = rng.normal(size=(5, 7, 3))
        np.testing.assert_allclose(qrot(qinverse(q), qrot(q, v)), v,
                                   atol=1e-12)

    def test_qrot_broadcast_shapes_guarded(self):
        q = np.array([[1.0, 0.0, 0.0, 0.0]])
        with pytest.raises(AssertionError):
            qrot(q, np.zeros((2, 3)))


class TestSeeding:
    def test_set_random_seeds_deterministic(self):
        key1, gen1 = set_random_seeds(123)
        draw1 = (np.asarray(key1).tolist(), gen1.normal(size=4).tolist())
        key2, gen2 = set_random_seeds(123)
        draw2 = (np.asarray(key2).tolist(), gen2.normal(size=4).tolist())
        assert draw1 == draw2
        key3, gen3 = set_random_seeds(124)
        assert np.asarray(key3).tolist() != draw1[0]
        assert gen3.normal(size=4).tolist() != draw1[1]

    def test_epoch_rng_streams_distinct_and_stable(self):
        a = epoch_rng(7, 0).normal(size=8)
        a_again = epoch_rng(7, 0).normal(size=8)
        b = epoch_rng(7, 1).normal(size=8)
        other_seed = epoch_rng(8, 0).normal(size=8)
        np.testing.assert_array_equal(a, a_again)
        assert not np.array_equal(a, b)
        assert not np.array_equal(a, other_seed)


class _StubDistribution:
    radius = 1.0

    def sample(self, n):
        rng = np.random.default_rng(n)
        theta = rng.uniform(0, 2 * np.pi, size=n)
        return theta, np.stack([np.cos(theta), np.sin(theta)], axis=-1)


class TestToyDatasets:
    def test_lifting_dataset_splits(self):
        from manipose_tpu.toy.datasets import LiftingDataset

        ds = LiftingDataset(_StubDistribution(), 10, 4, 6)
        for (x, y), n in zip((ds.train, ds.val, ds.test), (10, 4, 6)):
            assert x.shape == (n, 1) and x.dtype == np.float32
            assert y.shape == (n, 2) and y.dtype == np.float32

    def test_lifting_dataset_v2_keeps_input_dims(self):
        from manipose_tpu.toy.datasets import LiftingDatasetV2

        class Torus(_StubDistribution):
            def sample(self, n):
                rng = np.random.default_rng(n)
                x = rng.normal(size=(n, 2))
                return x, rng.normal(size=(n, 3))

        ds = LiftingDatasetV2(Torus(), 8, 2, 2)
        assert ds.x_train.shape == (8, 2)
        assert ds.y_train.shape == (8, 3)


class TestToyPlots:
    def test_plot_predictions_and_curve(self, tmp_path):
        from manipose_tpu.toy.plots import (plot_predictions,
                                            plot_training_curve)

        dist = _StubDistribution()
        _, y = dist.sample(32)
        preds = {"mlp": y[:, :2] * 0.9,
                 "rmcl": np.stack([y[:, :2]] * 3, axis=1)}
        out = plot_predictions(dist, None, y, preds, tmp_path / "p.png")
        assert (tmp_path / "p.png").stat().st_size > 0 and out.endswith("p.png")
        out2 = plot_training_curve([1.0, 0.5], [1.1, 0.6], tmp_path / "c.png")
        assert (tmp_path / "c.png").stat().st_size > 0 and out2.endswith("c.png")

    def test_plot_torus(self, tmp_path):
        from manipose_tpu.toy.plots import plot_torus_predictions

        rng = np.random.default_rng(0)
        y = rng.normal(size=(16, 3))
        plot_torus_predictions(y, {"m": rng.normal(size=(16, 2, 3))},
                               tmp_path / "t.png")
        assert (tmp_path / "t.png").stat().st_size > 0
