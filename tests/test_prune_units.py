"""Structural unit pruning."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from svd_lstm_tpu.factor.prune_units import prune_to_width, prune_units, unit_importance
from svd_lstm_tpu.models.lstm import init_stacked_lstm, stacked_lstm_apply


@pytest.fixture(scope="module")
def model():
    return init_stacked_lstm(jax.random.PRNGKey(0), 6, (12, 10))


@pytest.fixture(scope="module")
def x(rng_mod=np.random.default_rng(8)):
    return jnp.asarray(rng_mod.normal(size=(2, 30, 6)), jnp.float32)


def test_keep_all_is_identity(model, x):
    pruned = prune_units(model, [np.arange(12), np.arange(10)])
    y0 = stacked_lstm_apply(model, x)
    y1 = stacked_lstm_apply(pruned, x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), atol=1e-6)


def test_shapes_after_prune(model):
    pruned = prune_to_width(model, (8, 5))
    assert pruned.layers[0].W.shape == (6, 32)
    assert pruned.layers[0].U.shape == (8, 32)
    assert pruned.layers[1].W.shape == (8, 20)
    assert pruned.layers[1].U.shape == (5, 20)
    assert pruned.head.w.shape == (5, 1)


def test_pruned_matches_zeroed_units(model, x):
    """Exactness semantics: pruning == forcing the dropped units' states to
    zero in the original model."""
    keep0 = np.arange(6)  # drop units 6..11 of layer 0
    keep1 = np.arange(10)
    pruned = prune_units(model, [keep0, keep1])

    # emulate: zero out dropped units' influence by zeroing their U rows /
    # next-layer W rows AND their gate columns' effect on themselves...
    # simplest equivalent check: build a model where dropped units receive
    # zero drive (gate cols zeroed) so their h stays ~const; instead verify
    # on a functional property — pruned output equals original when the
    # original's dropped-unit weights are zeroed everywhere.
    W0 = np.asarray(model.layers[0].W).copy()
    U0 = np.asarray(model.layers[0].U).copy()
    b0 = np.asarray(model.layers[0].b).copy()
    n = 12
    drop = np.arange(6, 12)
    for g in range(4):
        W0[:, g * n + drop] = 0.0
        U0[:, g * n + drop] = 0.0
        b0[g * n + drop] = -1e9 if g in (0,) else 0.0  # i-gate closed
    U0[drop, :] = 0.0
    W1 = np.asarray(model.layers[1].W).copy()
    W1[drop, :] = 0.0
    zeroed = model._replace(
        layers=(
            model.layers[0]._replace(W=jnp.asarray(W0), U=jnp.asarray(U0), b=jnp.asarray(b0)),
            model.layers[1]._replace(W=jnp.asarray(W1)),
        )
    )
    y_pruned = stacked_lstm_apply(pruned, x)
    y_zeroed = stacked_lstm_apply(zeroed, x)
    np.testing.assert_allclose(np.asarray(y_pruned), np.asarray(y_zeroed), atol=1e-5)


def test_importance_shapes_and_positive(model):
    scores = unit_importance(model)
    assert [s.shape for s in scores] == [(12,), (10,)]
    assert all((s > 0).all() for s in scores)
