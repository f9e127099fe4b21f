"""Int8 weight quantization (utils/quantize.py) — a compression axis beyond
the reference's rank truncation; must bound elementwise error, preserve
pytree structure, compose with reduced models, and checkpoint."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import svd_lstm_tpu as st
from svd_lstm_tpu.models.lstm import init_stacked_lstm, stacked_lstm_apply
from svd_lstm_tpu.models.reduced import reduced_lstm_apply
from svd_lstm_tpu.utils.quantize import (
    QuantizedTensor,
    dequantize_params,
    dequantize_tensor,
    param_bytes,
    quantize_params,
    quantize_tensor,
    quantized_apply,
)


def test_elementwise_bound(rng):
    w = jnp.asarray(rng.normal(size=(37, 64)), jnp.float32)
    t = quantize_tensor(w)
    assert t.q.dtype == jnp.int8
    err = np.abs(np.asarray(dequantize_tensor(t)) - np.asarray(w))
    bound = np.asarray(t.scale / 2) + 1e-7
    assert (err <= bound).all()


def test_zero_column_is_exact():
    w = jnp.zeros((8, 4), jnp.float32)
    t = quantize_tensor(w)
    np.testing.assert_array_equal(np.asarray(dequantize_tensor(t)), np.asarray(w))


def test_structure_and_selectivity():
    params = init_stacked_lstm(jax.random.PRNGKey(0), input_dim=16, units=(32, 32))
    q = quantize_params(params)
    assert type(q) is type(params)
    # matrices quantized, 1-D biases untouched
    assert isinstance(q.layers[0].W, QuantizedTensor)
    assert isinstance(q.layers[0].U, QuantizedTensor)
    assert q.layers[0].b.dtype == jnp.float32
    assert isinstance(q.head.w, QuantizedTensor)
    back = dequantize_params(q)
    assert type(back) is type(params)
    assert back.layers[0].W.shape == params.layers[0].W.shape
    # ~4x smaller storage for the matrix-dominated pytree
    assert param_bytes(q) < 0.35 * param_bytes(params)


def _quantized_close(apply_fn, params, x, tol):
    ref = np.asarray(apply_fn(params, x))
    out = np.asarray(jax.jit(quantized_apply(apply_fn))(quantize_params(params), x))
    scale = max(np.abs(ref).max(), 1e-6)
    assert np.abs(out - ref).max() / scale < tol


def test_quantized_dense_forward(rng):
    params = init_stacked_lstm(jax.random.PRNGKey(1), input_dim=8, units=(16, 16))
    x = jnp.asarray(rng.normal(size=(2, 50, 8)), jnp.float32)
    _quantized_close(stacked_lstm_apply, params, x, tol=0.05)


def test_quantized_reduced_forward_split_and_merged(rng):
    params = init_stacked_lstm(jax.random.PRNGKey(2), input_dim=8, units=(12, 12))
    x = jnp.asarray(rng.normal(size=(1, 40, 8)), jnp.float32)
    for merged in (False, True):
        s = st.make_singular_model(params, merged_kernel=merged)
        r = st.make_reduced_model(s, rank=8)
        _quantized_close(reduced_lstm_apply, r, x, tol=0.05)


def test_quantized_checkpoint_roundtrip(tmp_path):
    from svd_lstm_tpu.io.checkpoint import load_params, save_params

    params = init_stacked_lstm(jax.random.PRNGKey(3), input_dim=5, units=(4,))
    q = quantize_params(params)
    path = str(tmp_path / "q.npz")
    save_params(path, q)
    back = load_params(path)
    assert isinstance(back.layers[0].W, QuantizedTensor)
    assert back.layers[0].W.q.dtype == jnp.int8
    for a, b in zip(jax.tree.leaves(q), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_quantize_params_idempotent():
    params = init_stacked_lstm(jax.random.PRNGKey(4), input_dim=5, units=(4,))
    q = quantize_params(params)
    qq = quantize_params(q)  # must be a no-op, not nested quantization
    assert isinstance(qq.layers[0].W, QuantizedTensor)
    assert not isinstance(qq.layers[0].W.scale, QuantizedTensor)
    for a, b in zip(jax.tree.leaves(q), jax.tree.leaves(qq)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_dequantized_params_rejects_merged_reduced(rng):
    """dequantized_params mirrors the int8 exporter's split-only contract:
    a merged reduced model must raise, not silently quantize per row
    (ADVICE r2)."""
    import pytest

    from svd_lstm_tpu.io.int8_export import dequantized_params

    params = init_stacked_lstm(jax.random.PRNGKey(7), input_dim=8, units=(12,))
    s = st.make_singular_model(params, merged_kernel=True)
    r = st.make_reduced_model(s, rank=8)
    with pytest.raises(ValueError, match="split"):
        dequantized_params(r)


@pytest.mark.parametrize("merged", [True, False])
def test_quantize_never_touches_sigma(merged):
    """sigma precision is what the Hoyer fine-tune trains; split-mode sigma
    stacks to (4, n) — 2-D — and must STILL stay f32 (the ndim rule alone
    quantized it)."""
    import svd_lstm_tpu as st
    from svd_lstm_tpu.models.lstm import init_stacked_lstm
    from svd_lstm_tpu.utils.quantize import QuantizedTensor, quantize_params

    dense = init_stacked_lstm(jax.random.PRNGKey(4), input_dim=5, units=(8, 7))
    smodel = st.make_singular_model(dense, merged_kernel=merged)
    q = quantize_params(smodel)
    for l, ql in zip(smodel.layers, q.layers):
        assert not isinstance(ql.ws, QuantizedTensor)
        assert not isinstance(ql.us, QuantizedTensor)
        np.testing.assert_array_equal(np.asarray(ql.ws), np.asarray(l.ws))
        np.testing.assert_array_equal(np.asarray(ql.us), np.asarray(l.us))
        # the factor matrices DO quantize
        assert isinstance(ql.wl, QuantizedTensor)
        assert isinstance(ql.ur, QuantizedTensor)
    assert isinstance(q.head.w, QuantizedTensor)
