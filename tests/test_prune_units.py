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


# ---------------------------------------------------------------------------
# Magnitude pruning of σ (C13 parity — the reference's abandoned tfmot
# prune_low_magnitude experiment, code/svd_acceleration_v3.py:101-108)
# ---------------------------------------------------------------------------

import jax
from svd_lstm_tpu.factor.prune_magnitude import (
    PolynomialDecaySchedule,
    finetune_with_pruning,
    magnitude_mask,
    prune_sigmas,
    sigma_sparsity,
)
from svd_lstm_tpu.factor.svd import make_singular_model
from svd_lstm_tpu.models.singular import singular_lstm_apply


class TestMagnitudePruning:
    def test_schedule_endpoints_and_monotonicity(self):
        sched = PolynomialDecaySchedule(final_sparsity=0.5, end_step=5000)
        assert sched(0) == 0.0
        assert np.isclose(sched(5000), 0.5) and np.isclose(sched(9000), 0.5)
        vals = [sched(s) for s in range(0, 6000, 250)]
        assert all(b >= a - 1e-12 for a, b in zip(vals, vals[1:]))

    def test_mask_prunes_smallest_fraction(self):
        v = np.array([0.1, -3.0, 0.01, 2.0, -0.5, 0.02])
        m = magnitude_mask(v, 0.5)
        np.testing.assert_array_equal(m, [0.0, 1.0, 0.0, 1.0, 1.0, 0.0])
        np.testing.assert_array_equal(magnitude_mask(v, 0.0), np.ones(6))

    def test_prune_sigmas_sparsity_and_model_runs(self):
        dense = init_stacked_lstm(jax.random.PRNGKey(0), input_dim=4, units=(8, 8))
        sm = make_singular_model(dense, merged_kernel=False)
        pruned = prune_sigmas(sm, 0.5)
        assert sigma_sparsity(sm) == 0.0
        assert np.isclose(sigma_sparsity(pruned), 0.5, atol=0.05)
        x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 10, 4)), jnp.float32)
        out = singular_lstm_apply(pruned, x)
        assert np.isfinite(np.asarray(out)).all()

    def test_finetune_with_pruning_reaches_target(self):
        from svd_lstm_tpu.config import FactorConfig, TrainConfig

        rng = np.random.default_rng(2)
        X = rng.normal(size=(1, 200, 4)).astype(np.float32)
        y = np.convolve(X[0, :, 0], np.ones(4) / 4, mode="same").astype(np.float32)
        dense = init_stacked_lstm(jax.random.PRNGKey(3), input_dim=4, units=(8,))
        sm = make_singular_model(dense, merged_kernel=False)
        tcfg = TrainConfig(num_windows=32, window_len=12, batch_size=16, epochs=3)
        sched = PolynomialDecaySchedule(final_sparsity=0.4, end_step=6)
        res = finetune_with_pruning(
            sm, X, y, schedule=sched,
            factor_cfg=FactorConfig(hoyer=0.0), train_cfg=tcfg,
        )
        assert np.isfinite(res.history).all()
        assert np.isclose(sigma_sparsity(res.params), 0.4, atol=0.05)
        # one continuous fine-tune: history covers every epoch, and the
        # returned opt_state is the live adam state (not a fresh init)
        assert len(res.history) == tcfg.epochs
        import optax

        counts = [
            int(np.asarray(c))
            for c in jax.tree.leaves(res.opt_state)
            if np.asarray(c).ndim == 0 and np.issubdtype(np.asarray(c).dtype, np.integer)
        ]
        steps_per_epoch = tcfg.num_windows // tcfg.batch_size
        assert max(counts) == tcfg.epochs * steps_per_epoch, (
            "adam step count must accumulate across pruning epochs "
            f"(got {counts}, want {tcfg.epochs * steps_per_epoch})"
        )
