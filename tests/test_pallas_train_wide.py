"""Fully-fused wide-layer train kernel (ops/pallas_train_wide.py):
interpret-mode forward and gradient parity with autodiff of the scan.

All kernel dots are DEFAULT-precision on f32 operands — exact f32 on CPU
interpret — so parity with the f32 scan oracle is tight (the same
contract every other trainable kernel in ops/ is tested under)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from svd_lstm_tpu.models.lstm import gate_update, init_stacked_lstm, stacked_lstm_apply
from svd_lstm_tpu.ops.pallas_train_wide import wide_layer_trainable

F32 = jnp.float32
DEF = jax.lax.Precision.DEFAULT


def scan_oracle(x, W, U, b):
    """The arithmetic the kernel must reproduce, as an XLA scan."""

    def step(carry, x_t):
        h, c = carry
        z = (
            jnp.dot(x_t, W, precision=DEF)
            + jnp.dot(h, U, precision=DEF)
            + b
        )
        h, c = gate_update(z, c)
        return (h, c), h

    B, n = x.shape[1], U.shape[0]
    init = (jnp.zeros((B, n), F32),) * 2
    _, h_seq = jax.lax.scan(step, init, x)
    return h_seq


def _mk(rng, T, B, n, d_scale=0.2):
    W = jnp.asarray(rng.normal(scale=d_scale, size=(n, 4 * n)), F32)
    U = jnp.asarray(rng.normal(scale=d_scale, size=(n, 4 * n)), F32)
    b = jnp.asarray(rng.normal(scale=0.1, size=(4 * n,)), F32)
    x = jnp.asarray(rng.normal(size=(T, B, n)), F32)
    return x, W, U, b


@pytest.mark.parametrize("T,B", [(6, 8), (5, 12)])  # 12: batch-tile padding
def test_wide_fused_forward_matches_scan(rng, T, B):
    n = 128
    x, W, U, b = _mk(rng, T, B, n)
    got = wide_layer_trainable(x, W, U, b, bt=8, bt_bwd=8, interpret=True)
    ref = scan_oracle(x, W, U, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_wide_fused_gradients_match_autodiff(rng):
    T, B, n = 6, 8, 128
    x, W, U, b = _mk(rng, T, B, n)
    cot = jnp.asarray(rng.normal(size=(T, B, n)), F32)

    def loss_k(x, W, U, b):
        return jnp.sum(wide_layer_trainable(x, W, U, b, 8, 8, True) * cot)

    def loss_ref(x, W, U, b):
        return jnp.sum(scan_oracle(x, W, U, b) * cot)

    g_k = jax.grad(loss_k, argnums=(0, 1, 2, 3))(x, W, U, b)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, W, U, b)
    for a, r, name in zip(g_k, g_r, "x W U b".split()):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(r), atol=1e-4, err_msg=name
        )


def test_wide_fused_multitile_batch_grads(rng):
    """Batch larger than the tile: dW/dU must accumulate across tiles and
    padded rows must stay gradient-inert."""
    T, B, n = 4, 20, 128  # bt=8 -> 3 tiles, 4 pad rows
    x, W, U, b = _mk(rng, T, B, n)

    def loss_k(x, W, U, b):
        return jnp.sum(wide_layer_trainable(x, W, U, b, 8, 8, True) ** 2)

    def loss_ref(x, W, U, b):
        return jnp.sum(scan_oracle(x, W, U, b) ** 2)

    g_k = jax.grad(loss_k, argnums=(1, 2, 3))(x, W, U, b)
    g_r = jax.grad(loss_ref, argnums=(1, 2, 3))(x, W, U, b)
    for a, r, name in zip(g_k, g_r, "W U b".split()):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(r), atol=2e-4, err_msg=name
        )


def test_stacked_apply_uniform_path_uses_wide_kernel(rng):
    """The uniform wide stack routes through the fused-layer kernel and
    matches the f32 scan apply (zero-padded first layer included)."""
    from svd_lstm_tpu.ops.pallas_train import stacked_lstm_apply_fast_train

    params = init_stacked_lstm(jax.random.PRNGKey(0), input_dim=6, units=(128, 128))
    x = jnp.asarray(rng.normal(size=(8, 7, 6)), F32)
    ref = np.asarray(stacked_lstm_apply(params, x, return_sequences=True))
    got = np.asarray(stacked_lstm_apply_fast_train(params, x, interpret=True))
    np.testing.assert_allclose(got, ref, atol=1e-5)

    # whole-stack gradients vs the f32 scan
    import functools

    def loss(apply_fn):
        def f(p):
            out = apply_fn(p, x, return_sequences=False)[..., 0]
            return jnp.mean(out**2)

        return f

    g_k = jax.grad(loss(functools.partial(stacked_lstm_apply_fast_train, interpret=True)))(params)
    g_r = jax.grad(loss(stacked_lstm_apply))(params)
    for a, r in zip(jax.tree.leaves(g_k), jax.tree.leaves(g_r)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r), atol=1e-5)


def test_wide_fused_split_path_parity(rng):
    """wide_fused=False (the round-3 split form) and the fused-layer path
    compute the same training forward."""
    from svd_lstm_tpu.ops.pallas_train import stacked_lstm_apply_fast_train

    params = init_stacked_lstm(jax.random.PRNGKey(1), input_dim=6, units=(128, 128))
    x = jnp.asarray(rng.normal(size=(8, 5, 6)), F32)
    a = np.asarray(
        stacked_lstm_apply_fast_train(params, x, interpret=True, wide_fused=True)
    )
    bb = np.asarray(
        stacked_lstm_apply_fast_train(params, x, interpret=True, wide_fused=False)
    )
    np.testing.assert_allclose(a, bb, atol=1e-5)
