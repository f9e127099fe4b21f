"""Weight merging (sequentialize parity) and the conv-LSTM hybrid."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from svd_lstm_tpu.models.conv import causal_conv1d, conv_lstm_apply, init_conv_lstm
from svd_lstm_tpu.models.lstm import init_lstm_layer, lstm_layer_apply
from svd_lstm_tpu.models.merge import merge_parallel_cell_weights


class TestMerge:
    @pytest.mark.parametrize("same_x", [True, False])
    def test_merged_equals_parallel(self, rng, same_x):
        """The merged cell's hidden sequence must equal the concatenation of
        the two parallel cells' hidden sequences."""
        d1 = d2 = 3 if same_x else 3
        if not same_x:
            d2 = 5
        c1 = init_lstm_layer(jax.random.PRNGKey(0), d1, 6)
        c2 = init_lstm_layer(jax.random.PRNGKey(1), d2, 4)
        merged = merge_parallel_cell_weights(c1, c2, same_x=same_x)

        x1 = jnp.asarray(rng.normal(size=(2, 20, d1)), jnp.float32)
        x2 = x1 if same_x else jnp.asarray(rng.normal(size=(2, 20, d2)), jnp.float32)
        h1 = lstm_layer_apply(c1, x1)
        h2 = lstm_layer_apply(c2, x2)

        xm = x1 if same_x else jnp.concatenate([x1, x2], axis=-1)
        hm = lstm_layer_apply(merged, xm)
        np.testing.assert_allclose(
            np.asarray(hm), np.asarray(jnp.concatenate([h1, h2], axis=-1)), atol=1e-5
        )

    def test_same_x_requires_matching_dims(self):
        c1 = init_lstm_layer(jax.random.PRNGKey(0), 3, 4)
        c2 = init_lstm_layer(jax.random.PRNGKey(1), 5, 4)
        with pytest.raises(ValueError):
            merge_parallel_cell_weights(c1, c2, same_x=True)


class TestConvLSTM:
    def test_causal(self, rng):
        """Changing future inputs must not change past outputs."""
        params = init_conv_lstm(jax.random.PRNGKey(0), in_channels=1)
        x = jnp.asarray(rng.normal(size=(1, 30, 1)), jnp.float32)
        y1 = causal_conv1d(params.conv, x)
        x2 = x.at[0, 20:].set(99.0)
        y2 = causal_conv1d(params.conv, x2)
        np.testing.assert_allclose(np.asarray(y1[:, :20]), np.asarray(y2[:, :20]), atol=1e-6)
        assert not np.allclose(np.asarray(y1[:, 20:]), np.asarray(y2[:, 20:]))

    def test_conv_matches_torch(self, rng):
        torch = pytest.importorskip("torch")
        params = init_conv_lstm(jax.random.PRNGKey(0), in_channels=2, filters=4, kernel_size=5)
        x = rng.normal(size=(2, 25, 2)).astype(np.float32)
        ours = np.asarray(causal_conv1d(params.conv, jnp.asarray(x)))

        m = torch.nn.Conv1d(2, 4, 5, padding=4)
        with torch.no_grad():
            # jax WIO (k, in, out) -> torch (out, in, k)
            m.weight.copy_(torch.tensor(np.asarray(params.conv.w).transpose(2, 1, 0)))
            m.bias.copy_(torch.tensor(np.asarray(params.conv.b)))
            theirs = m(torch.tensor(x.transpose(0, 2, 1)))[:, :, :25].numpy().transpose(0, 2, 1)
        np.testing.assert_allclose(ours, theirs, atol=1e-5)

    def test_full_model_shapes(self, rng):
        params = init_conv_lstm(jax.random.PRNGKey(0))
        x = jnp.asarray(rng.normal(size=(2, 40, 1)), jnp.float32)
        y = conv_lstm_apply(params, x)
        assert y.shape == (2, 40, 1)
        assert np.isfinite(np.asarray(y)).all()

    def test_trains(self):
        """Conv-LSTM fits the sine frequency task a little (loss decreases)."""
        import optax

        from svd_lstm_tpu.data.synthetic import generate_time_series

        X, y = generate_time_series(512, 40, y_type="frequency", seed=0)
        params = init_conv_lstm(jax.random.PRNGKey(1), filters=8, units=(8,))
        opt = optax.adam(3e-3)
        state = opt.init(params)

        @jax.jit
        def step(p, s, xb, yb):
            def loss(p):
                pred = conv_lstm_apply(p, xb, return_sequences=False)[..., 0]
                return jnp.mean((pred - yb) ** 2)

            l, g = jax.value_and_grad(loss)(p)
            u, s = opt.update(g, s, p)
            return optax.apply_updates(p, u), s, l

        losses = []
        for i in range(10):
            xb = jnp.asarray(X[i * 32 : (i + 1) * 32])
            yb = jnp.asarray(y[i * 32 : (i + 1) * 32])
            params, state, l = step(params, state, xb, yb)
            losses.append(float(l))
        assert losses[-1] < losses[0]


def test_two_step_is_the_spec_of_reduced_projection(rng):
    """two_step is the readable statement of the exact low-rank apply
    (reference old_versions/svd_classes.py:45-101); reduced_projection
    executes the same values in the folded (x@B)@[I|C] form. Pin the
    identity so the two statements cannot diverge."""
    from svd_lstm_tpu.models.reduced import (
        ReducedLayerParams,
        reduced_projection,
        two_step,
    )

    d, n, r = 5, 8, 3
    x = jnp.asarray(rng.normal(size=(4, d)), jnp.float32)
    # merged side
    B = jnp.asarray(rng.normal(size=(d, r)), jnp.float32)
    C = jnp.asarray(rng.normal(size=(r, 4 * n - r)), jnp.float32)
    merged = ReducedLayerParams(
        wB=B, wC=C,
        uB=jnp.zeros((n, r)), uC=jnp.zeros((r, 4 * n - r)),
        b=jnp.zeros(4 * n),
    )
    np.testing.assert_allclose(
        np.asarray(two_step(x, B, C)),
        np.asarray(reduced_projection(merged, x, "w")),
        atol=1e-6,
    )
    # split side: per-gate two_step concatenated == batched projection
    ranks = (2, 3, 1, 3)
    wB = tuple(jnp.asarray(rng.normal(size=(d, rg)), jnp.float32) for rg in ranks)
    wC = tuple(
        jnp.asarray(rng.normal(size=(rg, n - rg)), jnp.float32) for rg in ranks
    )
    split = ReducedLayerParams(
        wB=wB, wC=wC,
        uB=tuple(jnp.zeros((n, rg)) for rg in ranks),
        uC=tuple(jnp.zeros((rg, n - rg)) for rg in ranks),
        b=jnp.zeros(4 * n),
    )
    per_gate = jnp.concatenate(
        [two_step(x, B, C) for B, C in zip(wB, wC)], axis=-1
    )
    np.testing.assert_allclose(
        np.asarray(per_gate),
        np.asarray(reduced_projection(split, x, "w")),
        atol=1e-6,
    )
