"""Keras-semantics dropout in the LSTM layer."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from svd_lstm_tpu.models.lstm import init_lstm_layer, lstm_layer_apply


@pytest.fixture(scope="module")
def layer():
    return init_lstm_layer(jax.random.PRNGKey(0), 6, 10)


@pytest.fixture(scope="module")
def x(rng_mod=np.random.default_rng(5)):
    return jnp.asarray(rng_mod.normal(size=(4, 20, 6)), jnp.float32)


def test_zero_rate_is_identity(layer, x):
    a = lstm_layer_apply(layer, x)
    b = lstm_layer_apply(layer, x, dropout=0.0, recurrent_dropout=0.0)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_requires_rng(layer, x):
    with pytest.raises(ValueError):
        lstm_layer_apply(layer, x, dropout=0.3)


def test_dropout_changes_output_deterministically(layer, x):
    k = jax.random.PRNGKey(42)
    a = lstm_layer_apply(layer, x, dropout=0.4, rng=k)
    b = lstm_layer_apply(layer, x, dropout=0.4, rng=k)
    c = lstm_layer_apply(layer, x, dropout=0.4, rng=jax.random.PRNGKey(43))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))  # same key
    assert not np.allclose(np.asarray(a), np.asarray(c))         # different key
    assert not np.allclose(np.asarray(a), np.asarray(lstm_layer_apply(layer, x)))


def test_recurrent_dropout(layer, x):
    k = jax.random.PRNGKey(1)
    a = lstm_layer_apply(layer, x, recurrent_dropout=0.4, rng=k)
    assert np.isfinite(np.asarray(a)).all()
    assert not np.allclose(np.asarray(a), np.asarray(lstm_layer_apply(layer, x)))


def test_inverted_scaling_keeps_expectation(layer):
    """With a mask of rate p, E[masked x] = x — check the empirical mean of
    the gate pre-activations stays close to the undropped one."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(64, 5, 6)), jnp.float32)
    outs = []
    for i in range(16):
        outs.append(
            np.asarray(
                lstm_layer_apply(layer, x, dropout=0.3, rng=jax.random.PRNGKey(i))
            )
        )
    mean_drop = np.mean(outs, axis=0)
    ref = np.asarray(lstm_layer_apply(layer, x))
    # nonlinearity biases the mean slightly; loose tolerance
    assert np.abs(mean_drop - ref).mean() < 0.05
