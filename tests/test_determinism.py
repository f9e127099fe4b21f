"""jit determinism (SURVEY §5: the single-controller analog of race
detection) and bf16 inference bounds."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from svd_lstm_tpu.models.lstm import init_stacked_lstm, stacked_lstm_apply
from svd_lstm_tpu.utils.precision import cast_params


class TestDeterminism:
    def test_forward_bitwise_repeatable(self, rng):
        params = init_stacked_lstm(jax.random.PRNGKey(0), 8, (12, 12))
        x = jnp.asarray(rng.normal(size=(3, 50, 8)), jnp.float32)
        f = jax.jit(lambda p, xx: stacked_lstm_apply(p, xx))
        a = np.asarray(f(params, x))
        b = np.asarray(f(params, x))
        np.testing.assert_array_equal(a, b)

    def test_train_step_repeatable(self, rng):
        import optax

        from svd_lstm_tpu.config import TrainConfig
        from svd_lstm_tpu.train.loop import fit

        X = rng.normal(size=(1, 300, 4)).astype(np.float32)
        y = rng.normal(size=(300,)).astype(np.float32)
        params = init_stacked_lstm(jax.random.PRNGKey(1), 4, (8,))
        cfg = TrainConfig(num_windows=64, window_len=20, epochs=2, batch_size=32, seed=5)
        r1 = fit(params, X, y, cfg)
        r2 = fit(params, X, y, cfg)
        assert r1.history == r2.history
        for a, b in zip(jax.tree.leaves(r1.params), jax.tree.leaves(r2.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestBf16:
    def test_cast_and_bounded_error(self, rng):
        params = init_stacked_lstm(jax.random.PRNGKey(0), 8, (16, 16))
        x = jnp.asarray(rng.normal(size=(2, 60, 8)), jnp.float32)
        ref = np.asarray(stacked_lstm_apply(params, x))

        p16 = cast_params(params, jnp.bfloat16)
        assert p16.layers[0].W.dtype == jnp.bfloat16
        out = np.asarray(
            stacked_lstm_apply(p16, x.astype(jnp.bfloat16)).astype(jnp.float32)
        )
        # bf16 has ~3 decimal digits; over 60 recurrent steps errors grow but
        # must stay small relative to the O(1) output scale
        assert np.abs(out - ref).max() < 0.1
        assert np.abs(out - ref).mean() < 0.02
