"""Roofline accounting + multi-run batcher."""

import numpy as np

from svd_lstm_tpu.bench.roofline import dense_step_cost, reduced_step_cost, report
from svd_lstm_tpu.data.batcher import split_train_random_multi


class TestRoofline:
    def test_dense_cost_positive_and_scales(self):
        small = dense_step_cost(16, (40,) * 4)
        big = dense_step_cost(16, (512,) * 4)
        assert big.bytes_streamed > small.bytes_streamed
        assert big.macs > small.macs
        assert small.bandwidth_floor_us() > small.compute_floor_us()

    def test_reduced_less_streaming_at_wide(self):
        dense = dense_step_cost(16, (512,) * 3)
        red = reduced_step_cost(16, (512,) * 3, (32,) * 3, merged=True)
        assert red.bytes_streamed < dense.bytes_streamed / 2

    def test_report_string(self):
        s = report(dense_step_cost(16, (40,) * 4), measured_us_per_step=0.664)
        assert "roofline" in s and "ns/step" in s


class TestMultiRunBatcher:
    def test_shapes_and_run_sampling(self):
        R, T, d = 5, 200, 3
        X = np.zeros((R, T, d), np.float32)
        for r in range(R):
            X[r] = r
        y = np.tile(np.arange(T, dtype=np.float32), (R, 1))
        Xm, ym = split_train_random_multi(X, y, batch_size=16, train_len=20, seed=0)
        assert Xm.shape == (16, 20, d) and ym.shape == (16,)
        # every window comes from a single run (constant feature value)
        assert (Xm.min(axis=(1, 2)) == Xm.max(axis=(1, 2))).all()
        # labels are window-end values
        assert ((ym >= 20) & (ym < T)).all()
