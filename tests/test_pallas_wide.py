"""Kernels with n > 128 (multi-tile gate blocks, npg=256) in interpret mode
— guards the padding arithmetic the wide-model results rely on."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from svd_lstm_tpu.factor.svd import make_reduced_model, make_singular_model
from svd_lstm_tpu.models.lstm import LSTMLayerParams, init_stacked_lstm, stacked_lstm_apply
from svd_lstm_tpu.models.reduced import reduced_lstm_apply
from svd_lstm_tpu.ops.pallas_lstm import (
    fused_dense_stack_pallas,
    fused_reduced_stack_pallas,
    lstm_recurrence_pallas,
)
from svd_lstm_tpu.ops.recurrence import lstm_recurrence_xla

N = 136  # forces npg = 256 with 120 dead lanes per gate


def test_wide_recurrence_matches_xla(rng):
    T = 12
    U = jnp.asarray(rng.normal(scale=0.2, size=(N, 4 * N)), jnp.float32)
    xp = jnp.asarray(rng.normal(size=(T, 4 * N)), jnp.float32)
    ours = lstm_recurrence_pallas(xp, U, interpret=True)
    ref = lstm_recurrence_xla(xp[None], U, jnp.zeros((1, N)), jnp.zeros((1, N)))[0]
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=1e-5)


def test_wide_fused_dense(rng):
    params = init_stacked_lstm(jax.random.PRNGKey(0), 8, (N, N))
    x = jnp.asarray(rng.normal(size=(10, 8)), jnp.float32)
    ref = np.asarray(stacked_lstm_apply(params, x[None]))[0]
    got = np.asarray(fused_dense_stack_pallas(params, x, interpret=True))
    np.testing.assert_allclose(got, ref, atol=2e-5)


@pytest.mark.parametrize("merged", [True, False])
def test_wide_fused_reduced(rng, merged):
    params = init_stacked_lstm(jax.random.PRNGKey(1), 8, (N,))
    rmodel = make_reduced_model(make_singular_model(params, merged_kernel=merged), rank=20)
    x = jnp.asarray(rng.normal(size=(10, 8)), jnp.float32)
    ref = np.asarray(reduced_lstm_apply(rmodel, x[None]))[0]
    got = np.asarray(fused_reduced_stack_pallas(rmodel, x, interpret=True))
    np.testing.assert_allclose(got, ref, atol=2e-5)
