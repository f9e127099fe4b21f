"""Kernel-layout transformation: dense-reconstructed recurrence must match
the two-step reduced forward exactly."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from svd_lstm_tpu.factor.svd import make_reduced_model, make_singular_model
from svd_lstm_tpu.models.lstm import init_stacked_lstm
from svd_lstm_tpu.models.reduced import reduced_lstm_apply
from svd_lstm_tpu.ops.layouts import (
    reconstruct_recurrent_dense,
    reduced_forward_dense_recurrent,
)


@pytest.fixture(scope="module", params=[True, False], ids=["merged", "split"])
def rmodel(request):
    dense = init_stacked_lstm(jax.random.PRNGKey(9), input_dim=8, units=(12, 12))
    smodel = make_singular_model(dense, merged_kernel=request.param)
    return make_reduced_model(smodel, rank=5)


def test_reconstruction_shape(rmodel):
    U = reconstruct_recurrent_dense(rmodel.layers[0])
    assert U.shape == (12, 48)


def test_dense_recurrent_layout_matches_two_step(rmodel, rng):
    x = jnp.asarray(rng.normal(size=(2, 30, 8)), jnp.float32)
    ref = reduced_lstm_apply(rmodel, x, return_sequences=True)
    got = reduced_forward_dense_recurrent(rmodel, x, return_sequences=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-5)


def test_rank_bounded(rmodel):
    """The reconstructed recurrent kernel has rank ≤ 4·r (split) — the
    compression is real even though the execution layout is dense."""
    U = np.asarray(reconstruct_recurrent_dense(rmodel.layers[0]))
    n = 12
    for g in range(4):
        blk = U[:, g * n : (g + 1) * n]
        assert np.linalg.matrix_rank(blk, tol=1e-4) <= 5
