"""Trainable Pallas recurrence (ops/pallas_train.py): interpret-mode
forward parity and gradient parity with autodiff of the scan recurrence."""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from svd_lstm_tpu.models.lstm import init_stacked_lstm, stacked_lstm_apply
from svd_lstm_tpu.ops.pallas_train import (
    _fwd_scan_hc,
    lstm_recurrence_trainable,
    stacked_lstm_apply_fast_train,
)


@pytest.mark.parametrize("T,B,n", [(5, 8, 128), (4, 12, 128)])  # 12: batch padding
def test_recurrence_gradients_match_autodiff(rng, T, B, n):
    U = jnp.asarray(rng.normal(size=(n, 4 * n)).astype(np.float32)) * 0.05
    xp = jnp.asarray(rng.normal(size=(T, B, 4 * n)).astype(np.float32))
    cot = jnp.asarray(rng.normal(size=(T, B, n)).astype(np.float32))

    def loss_ref(xp, U):
        return jnp.sum(_fwd_scan_hc(xp, U)[0] * cot)

    def loss_kernel(xp, U):
        return jnp.sum(lstm_recurrence_trainable(xp, U, 8, True) * cot)

    g_ref = jax.grad(loss_ref, argnums=(0, 1))(xp, U)
    g_k = jax.grad(loss_kernel, argnums=(0, 1))(xp, U)
    np.testing.assert_allclose(np.asarray(g_k[0]), np.asarray(g_ref[0]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_k[1]), np.asarray(g_ref[1]), atol=1e-5)


def test_apply_fast_train_matches_exact_forward(rng):
    params = init_stacked_lstm(jax.random.PRNGKey(0), input_dim=6, units=(128, 24))
    x = jnp.asarray(rng.normal(size=(8, 9, 6)).astype(np.float32))
    y_ref = np.asarray(stacked_lstm_apply(params, x, return_sequences=True))
    y = np.asarray(stacked_lstm_apply_fast_train(params, x, interpret=True))
    # CPU DEFAULT-precision dots are exact f32 — identical arithmetic
    np.testing.assert_allclose(y, y_ref, atol=1e-5)
    y_last = np.asarray(
        stacked_lstm_apply_fast_train(params, x, return_sequences=False, interpret=True)
    )
    np.testing.assert_allclose(y_last, y_ref[:, -1], atol=1e-5)


def test_fit_with_fast_train_apply(rng):
    """End-to-end: fit() trains through the custom-VJP recurrence and
    matches the scan-apply fit's loss trajectory on CPU (same arithmetic)."""
    from svd_lstm_tpu.config import TrainConfig
    from svd_lstm_tpu.train.loop import fit

    X = rng.normal(size=(1, 160, 6)).astype(np.float32)
    y = np.convolve(X[0, :, 0], np.ones(4) / 4, mode="same").astype(np.float32)
    params = init_stacked_lstm(jax.random.PRNGKey(1), input_dim=6, units=(128,))
    cfg = TrainConfig(num_windows=16, window_len=10, batch_size=8, epochs=2)

    apply_fast = functools.partial(stacked_lstm_apply_fast_train, interpret=True)
    r_fast = fit(params, X, y, cfg=cfg, apply_fn=apply_fast)
    r_scan = fit(params, X, y, cfg=cfg)
    assert np.isfinite(r_fast.history).all()
    # identical arithmetic on CPU up to dot-order roundoff
    np.testing.assert_allclose(r_fast.history, r_scan.history, rtol=1e-3)


def test_fit_recurrence_kernel_config_flag(rng):
    """TrainConfig.recurrence_kernel=True swaps the default apply for the
    custom-VJP kernel path (interpret mode on CPU) and trains to the same
    losses as the scan."""
    from svd_lstm_tpu.config import TrainConfig
    from svd_lstm_tpu.train.loop import fit

    X = rng.normal(size=(1, 120, 6)).astype(np.float32)
    y = np.convolve(X[0, :, 0], np.ones(4) / 4, mode="same").astype(np.float32)
    params = init_stacked_lstm(jax.random.PRNGKey(2), input_dim=6, units=(128,))
    base = dict(num_windows=16, window_len=10, batch_size=8, epochs=2)
    r_k = fit(params, X, y, cfg=TrainConfig(recurrence_kernel=True, **base))
    r_s = fit(params, X, y, cfg=TrainConfig(**base))
    np.testing.assert_allclose(r_k.history, r_s.history, rtol=1e-3)


def test_apply_fast_train_uniform_stack_scan_path(rng):
    """Uniform lane-aligned WIDE stacks (n > 128) take the scan-over-layers
    path whose body is the fully-fused layer kernel
    (ops/pallas_train_wide.py; layer-1 zero-padding is exact). Narrow
    stacks route to the fused whole-stack kernel instead (test below)."""
    params = init_stacked_lstm(jax.random.PRNGKey(3), input_dim=6, units=(256, 256))
    x = jnp.asarray(rng.normal(size=(8, 5, 6)).astype(np.float32))
    y_ref = np.asarray(stacked_lstm_apply(params, x, return_sequences=True))
    y = np.asarray(stacked_lstm_apply_fast_train(params, x, interpret=True))
    np.testing.assert_allclose(y, y_ref, atol=1e-5)
    # gradients flow through the scanned kernel pair
    def loss(p):
        return jnp.sum(stacked_lstm_apply_fast_train(p, x, interpret=True) ** 2)

    def loss_ref(p):
        return jnp.sum(stacked_lstm_apply(p, x, return_sequences=True) ** 2)

    g = jax.grad(loss)(params)
    g_ref = jax.grad(loss_ref)(params)
    for a, b in zip(jax.tree.leaves(g), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_apply_fast_train_narrow_fused_path(rng):
    """Narrow stacks (all n <= 128) route to the fused whole-stack kernel
    pair — forward exact, gradients parity with autodiff."""
    params = init_stacked_lstm(
        jax.random.PRNGKey(4), input_dim=6, units=(40, 30, 40)
    )
    x = jnp.asarray(rng.normal(size=(8, 6, 6)).astype(np.float32))
    y_ref = np.asarray(stacked_lstm_apply(params, x, return_sequences=True))
    y = np.asarray(stacked_lstm_apply_fast_train(params, x, interpret=True))
    np.testing.assert_allclose(y, y_ref, atol=1e-5)

    def loss(p):
        return jnp.sum(
            stacked_lstm_apply_fast_train(p, x, return_sequences=False, interpret=True)
            ** 2
        )

    def loss_ref(p):
        return jnp.sum(
            stacked_lstm_apply(p, x, return_sequences=False) ** 2
        )

    g = jax.grad(loss)(params)
    g_ref = jax.grad(loss_ref)(params)
    for a, b in zip(jax.tree.leaves(g), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_fused_fwd_kernel_matches_scan_directly(rng):
    """_fused_fwd itself (not the custom_vjp primal, which runs XLA scans
    outside differentiation) must reproduce the scan's states exactly."""
    from svd_lstm_tpu.models.lstm import init_stacked_lstm
    from svd_lstm_tpu.ops.pallas_train_fused import _fused_fwd

    params = init_stacked_lstm(jax.random.PRNGKey(5), input_dim=6, units=(40, 24))
    x1 = jnp.asarray(
        np.random.default_rng(3).normal(size=(5, 8, 6)).astype(np.float32)
    )  # (T, B, d)
    h_all, c_all = _fused_fwd(tuple(params.layers), x1, interpret=True)

    h = jnp.swapaxes(x1, 0, 1)
    for i, layer in enumerate(params.layers):
        from svd_lstm_tpu.models.lstm import lstm_layer_apply

        h = lstm_layer_apply(layer, h)
        u = layer.units
        np.testing.assert_allclose(
            np.asarray(h_all[:, :, i * 128 : i * 128 + u]),
            np.asarray(jnp.swapaxes(h, 0, 1)),
            atol=1e-5,
        )


def test_apply_fast_train_uniform_stack_wide_input_fallback(rng):
    """Uniform lane-aligned stack with input_dim > n0 can't stack layer-1's
    W with the others — it must fall back to the XLA scan (ADVICE r2) and
    still match the exact forward."""
    params = init_stacked_lstm(jax.random.PRNGKey(4), input_dim=200, units=(128, 128))
    x = jnp.asarray(rng.normal(size=(8, 4, 200)).astype(np.float32))
    y_ref = np.asarray(stacked_lstm_apply(params, x, return_sequences=True))
    y = np.asarray(stacked_lstm_apply_fast_train(params, x, interpret=True))
    np.testing.assert_allclose(y, y_ref, atol=1e-5)


def test_apply_fast_train_balanced_chunk_boundaries(rng):
    """The B > 496 balanced-chunk dispatch (ops/pallas_train.py): B=600
    splits into 3×200 with zero pad rows; B=997 (odd, not a multiple of 8)
    pads to 4×256 and slices back — both must match the exact forward
    row-for-row."""
    params = init_stacked_lstm(jax.random.PRNGKey(5), input_dim=6, units=(10,))
    for B in (600, 997):
        x = jnp.asarray(rng.normal(size=(B, 3, 6)).astype(np.float32))
        y_ref = np.asarray(stacked_lstm_apply(params, x, return_sequences=True))
        y = np.asarray(stacked_lstm_apply_fast_train(params, x, interpret=True))
        assert y.shape == y_ref.shape
        np.testing.assert_allclose(y, y_ref, atol=1e-5)
