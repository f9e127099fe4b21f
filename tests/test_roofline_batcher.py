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

    def test_train_cost_wide_vs_narrow(self):
        from svd_lstm_tpu.bench.roofline import (
            narrow_train_step_cost,
            wide_train_step_cost,
        )

        w = wide_train_step_cost(16, (512,) * 3, B=128, T=200)
        # per layer-step: 8 dots of B*n*4n MACs, 9 (B, n) f32 blocks
        assert w.macs_executed == 8 * 3 * 128 * 200 * 512 * 4 * 512
        assert w.hbm_bytes == 9 * 3 * 128 * 200 * 512 * 4
        # wide training is compute-bound in this layout
        assert w.compute_floor_ms() > w.bandwidth_floor_ms()
        # model MACs = 3x forward
        d, fwd = 16, 0
        for n in (512,) * 3:
            fwd += 128 * 200 * (d * 4 * n + n * 4 * n)
            d = n
        assert w.macs_model == 3 * fwd

        nar = narrow_train_step_cost(16, (40,) * 4, B=512, T=200)
        # P-layout padding: executed MACs dwarf model MACs at n=40
        assert nar.macs_executed > 5 * nar.macs_model
        # floor_fraction / mfu are monotone in measured time
        assert nar.floor_fraction(4.0) > nar.floor_fraction(2.5) > 0
        assert 0 < nar.mfu(4.0) < nar.mfu(2.5) < 1

    def test_train_cost_narrow_rounds_batch_to_8(self):
        from svd_lstm_tpu.bench.roofline import narrow_train_step_cost

        a = narrow_train_step_cost(16, (40,) * 4, B=9, T=10)
        b = narrow_train_step_cost(16, (40,) * 4, B=16, T=10)
        assert a.macs_executed == b.macs_executed  # 9 -> 16 padded rows
        assert a.macs_model < b.macs_model  # model MACs count true B


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


def test_narrow_train_cost_compact_layout():
    """layout="compact" (the dispatch's auto resolution at B >= 128)
    halves the executed MACs at n=40 (k=2 gates per block) and leaves the
    HBM bytes unchanged (the streamed blocks are h/c-state-sized)."""
    from svd_lstm_tpu.bench.roofline import narrow_train_step_cost

    p = narrow_train_step_cost(16, (40, 40, 40, 40), 512, 200, layout="p")
    c = narrow_train_step_cost(16, (40, 40, 40, 40), 512, 200, layout="compact")
    assert c.macs_executed * 2 == p.macs_executed
    assert c.hbm_bytes == p.hbm_bytes
    assert c.macs_model == p.macs_model
    # at this point the compact floor flips to HBM-bound
    assert c.bandwidth_floor_ms() > c.compute_floor_ms()
    assert p.compute_floor_ms() > p.bandwidth_floor_ms()
