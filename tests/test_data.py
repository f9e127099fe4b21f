"""Data-layer tests: scalers, resampling, preprocessing, batching."""

import numpy as np
import pytest

from svd_lstm_tpu.config import DataConfig
from svd_lstm_tpu.data.batcher import split_train_random, window_epoch_iterator
from svd_lstm_tpu.data.dropbear import (
    _fft_resample_numpy,
    fft_resample,
    forward_fill_nan,
    preprocess_raw,
)
from svd_lstm_tpu.data.scalers import StandardScaler
from svd_lstm_tpu.data.synthetic import generate_time_series, synthetic_dropbear_raw


class TestStandardScaler:
    def test_matches_sklearn(self, rng):
        sk = pytest.importorskip("sklearn.preprocessing")
        x = rng.normal(3.0, 7.0, size=(1000, 1))
        ours = StandardScaler().fit(x)
        theirs = sk.StandardScaler().fit(x)
        np.testing.assert_allclose(ours.transform(x), theirs.transform(x), rtol=1e-10)
        np.testing.assert_allclose(
            ours.inverse_transform(ours.transform(x)), x, rtol=1e-10
        )

    def test_zero_variance(self):
        x = np.full((10, 1), 5.0)
        s = StandardScaler().fit(x)
        assert np.all(np.isfinite(s.transform(x)))


class TestResample:
    @pytest.mark.parametrize("n,num", [(1000, 640), (1000, 1600), (999, 640), (1000, 641)])
    def test_numpy_matches_scipy(self, rng, n, num):
        scipy_signal = pytest.importorskip("scipy.signal")
        x = rng.normal(size=n)
        ours = _fft_resample_numpy(x, num)
        theirs = scipy_signal.resample(x, num)
        np.testing.assert_allclose(ours, theirs, atol=1e-9)

    def test_time_axis(self, rng):
        x = rng.normal(size=1000)
        t = np.arange(1000) * 0.01 + 5.0
        y, t_new = fft_resample(x, 500, t)
        assert y.shape == (500,)
        assert t_new[0] == pytest.approx(5.0)
        assert t_new[1] - t_new[0] == pytest.approx(0.02)


def test_forward_fill_nan():
    x = np.array([1.0, np.nan, np.nan, 4.0, np.nan])
    np.testing.assert_array_equal(forward_fill_nan(x), [1.0, 1.0, 1.0, 4.0, 4.0])


class TestPreprocess:
    @pytest.fixture(scope="class")
    def dataset(self):
        raw = synthetic_dropbear_raw(duration=8.0)
        return preprocess_raw(raw, DataConfig(split_time=4.0))

    def test_shapes(self, dataset):
        ds = dataset
        assert ds.X.ndim == 3 and ds.X.shape[0] == 1 and ds.X.shape[2] == 16
        assert ds.y.shape == (ds.X.shape[1],)
        assert ds.t.shape == ds.y.shape
        assert ds.X_train.shape[1] + ds.X_test.shape[1] == ds.X.shape[1]

    def test_standardized(self, dataset):
        flat = dataset.X.reshape(-1)
        assert abs(flat.mean()) < 0.05
        assert abs(flat.std() - 1.0) < 0.05
        assert abs(dataset.y.mean()) < 0.05

    def test_frame_clock(self, dataset):
        # frame-start times advance by frame_width * sampling_period
        cfg = DataConfig()
        dt = np.diff(dataset.t)
        assert np.allclose(dt, cfg.frame_width * cfg.sampling_period, rtol=1e-3)

    def test_split_boundary(self, dataset):
        assert dataset.t_train.max() < 4.0 < dataset.t_test.min()

    def test_scaler_roundtrip(self, dataset):
        y_m = dataset.pin_scaler.inverse_transform(dataset.y.reshape(-1, 1))
        # pin locations are physical (0.05–0.2 m in the synthetic profile)
        assert 0.0 < y_m.min() and y_m.max() < 0.3

    def test_nan_free(self, dataset):
        assert np.isfinite(dataset.X).all() and np.isfinite(dataset.y).all()


class TestBatcher:
    def test_shapes_and_labels(self):
        T, d = 500, 16
        X = np.arange(T * d, dtype=np.float32).reshape(1, T, d)
        y = np.arange(T, dtype=np.float32)
        Xm, ym = split_train_random(X, y, batch_size=8, train_len=50, seed=0)
        assert Xm.shape == (8, 50, d)
        assert ym.shape == (8,)
        # label must be the value at window end: start + train_len
        starts = (Xm[:, 0, 0] / d).astype(int)
        np.testing.assert_array_equal(ym, y[starts + 50])

    def test_epoch_iterator_static_shapes(self):
        X = np.zeros((100, 10, 4), np.float32)
        y = np.zeros((100,), np.float32)
        batches = list(window_epoch_iterator(X, y, batch_size=32))
        assert len(batches) == 3
        assert all(b[0].shape == (32, 10, 4) for b in batches)


def test_sine_generator():
    X, y = generate_time_series(16, 75, y_type="frequency", seed=0)
    assert X.shape == (16, 75, 1) and y.shape == (16,)
    assert (y > 0.05).all() and (y < 0.6).all()
    X2, _ = generate_time_series(16, 75, y_type="frequency", seed=0)
    np.testing.assert_array_equal(X, X2)  # deterministic under seed
