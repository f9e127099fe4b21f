"""Chunked-time BPTT rematerialization (models/lstm.py remat_chunk).

The reference caps training context at 200-step windows purely by windowing
(code/svd_acceleration_v3.py:113); remat removes the memory half of that
cap: jax.checkpoint around inner time chunks makes autodiff save only raw
input chunks + chunk-boundary carries (O(T/K + K) live activations instead
of O(T)) and recompute projections/gates on the backward pass. Values are
identical — the recompute is the same arithmetic.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svd_lstm_tpu.config import TrainConfig
from svd_lstm_tpu.models.lstm import (
    init_stacked_lstm,
    lstm_layer_apply,
    stacked_lstm_apply,
)


@pytest.fixture(scope="module")
def small_model():
    params = init_stacked_lstm(jax.random.PRNGKey(0), input_dim=8, units=(12, 12))
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 37, 8), jnp.float32)
    return params, x


@pytest.mark.parametrize("chunk", [7, 10, 37, 100])
def test_forward_parity(small_model, chunk):
    # 7 and 10 exercise the tail path (37 % K != 0); 37 and 100 must take
    # the plain un-chunked scan (remat_chunk < T is required to chunk)
    params, x = small_model
    base = stacked_lstm_apply(params, x)
    out = stacked_lstm_apply(params, x, remat_chunk=chunk)
    np.testing.assert_allclose(np.asarray(out), np.asarray(base), atol=1e-6)


def test_forward_state_and_dropout_parity(small_model):
    params, x = small_model
    rng = jax.random.PRNGKey(3)
    kw = dict(dropout=0.3, recurrent_dropout=0.2, rng=rng, return_state=True)
    seq0, (h0, c0) = lstm_layer_apply(params.layers[0], x, **kw)
    seq1, (h1, c1) = lstm_layer_apply(params.layers[0], x, remat_chunk=10, **kw)
    np.testing.assert_allclose(np.asarray(seq1), np.asarray(seq0), atol=1e-6)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h0), atol=1e-6)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c0), atol=1e-6)


def test_gradient_parity(small_model):
    params, x = small_model
    y = jax.random.normal(jax.random.PRNGKey(2), (3,))

    def loss(p, chunk):
        pred = stacked_lstm_apply(p, x, return_sequences=False, remat_chunk=chunk)
        return jnp.mean(jnp.square(pred[..., 0] - y))

    g0 = jax.grad(lambda p: loss(p, 0))(params)
    g1 = jax.grad(lambda p: loss(p, 10))(params)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_memory_reduction_at_long_window():
    """The point of the feature: the compiled backward's temp buffers shrink
    by ~the chunking factor at long T (measured ~10x at T=4096/K=64 on the
    CPU backend, which shares XLA's buffer-assignment accounting)."""
    params = init_stacked_lstm(jax.random.PRNGKey(0), input_dim=8, units=(12, 12))
    x = jax.random.normal(jax.random.PRNGKey(4), (4, 4096, 8), jnp.float32)

    def make(chunk):
        def loss(p):
            pred = stacked_lstm_apply(p, x, return_sequences=False, remat_chunk=chunk)
            return jnp.mean(jnp.square(pred))

        return jax.jit(jax.grad(loss)).lower(params).compile()

    try:
        plain = make(0).memory_analysis().temp_size_in_bytes
        remat = make(64).memory_analysis().temp_size_in_bytes
    except (AttributeError, NotImplementedError) as e:  # pragma: no cover
        pytest.skip(f"memory_analysis unavailable on this backend: {e}")
    assert remat < plain / 4, (plain, remat)


@pytest.mark.parametrize("merged", [False, True])
def test_singular_parity(small_model, merged):
    """The factorized family chunks identically — forward (incl. tail,
    dropout) and σ/U/V gradients."""
    from svd_lstm_tpu.factor.svd import make_singular_model
    from svd_lstm_tpu.models.singular import singular_lstm_apply

    dense, x = small_model
    sp = make_singular_model(dense, merged_kernel=merged)

    base = singular_lstm_apply(sp, x)
    out = singular_lstm_apply(sp, x, remat_chunk=10)
    np.testing.assert_allclose(np.asarray(out), np.asarray(base), atol=1e-6)

    rng = jax.random.PRNGKey(5)
    kw = dict(dropout=0.25, recurrent_dropout=0.25, rng=rng)
    d0 = singular_lstm_apply(sp, x, **kw)
    d1 = singular_lstm_apply(sp, x, remat_chunk=10, **kw)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d0), atol=1e-6)

    y = jax.random.normal(jax.random.PRNGKey(2), (3,))

    def loss(p, chunk):
        pred = singular_lstm_apply(p, x, return_sequences=False, remat_chunk=chunk)
        return jnp.mean(jnp.square(pred[..., 0] - y))

    g0 = jax.grad(lambda p: loss(p, 0))(sp)
    g1 = jax.grad(lambda p: loss(p, 10))(sp)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_finetune_honors_remat_chunk():
    """The σ-only fine-tune (the reference's central stage) accepts the
    knob through fit(): losses match the plain fine-tune."""
    from svd_lstm_tpu.config import FactorConfig
    from svd_lstm_tpu.factor.svd import make_singular_model
    from svd_lstm_tpu.train.finetune import finetune

    rng = np.random.default_rng(1)
    X = rng.normal(size=(1, 400, 8)).astype(np.float32)
    y = rng.normal(size=(400,)).astype(np.float32)
    dense = init_stacked_lstm(jax.random.PRNGKey(0), input_dim=8, units=(12,))
    sp = make_singular_model(dense)

    kw = dict(num_windows=8, window_len=50, batch_size=4, epochs=2)
    base = finetune(sp, X, y, FactorConfig(hoyer=0.01), TrainConfig(**kw))
    remat = finetune(sp, X, y, FactorConfig(hoyer=0.01),
                     TrainConfig(**kw, remat_chunk=16))
    np.testing.assert_allclose(remat.history, base.history, rtol=1e-5)


def test_dropout_gradient_parity(small_model):
    """The genuinely new autodiff path: backward recompute of the MASKED
    projections through the closed-over dropout masks, both families."""
    from svd_lstm_tpu.factor.svd import make_singular_model
    from svd_lstm_tpu.models.singular import singular_lstm_apply

    dense, x = small_model
    sp = make_singular_model(dense, merged_kernel=False)
    rng = jax.random.PRNGKey(7)
    y = jax.random.normal(jax.random.PRNGKey(2), (3,))

    def dense_loss(p, chunk):
        h = x
        for layer in p.layers:
            h = lstm_layer_apply(layer, h, dropout=0.3, recurrent_dropout=0.2,
                                 rng=rng, remat_chunk=chunk)
        return jnp.mean(jnp.square(h[:, -1, 0] - y))

    def sing_loss(p, chunk):
        pred = singular_lstm_apply(p, x, return_sequences=False, dropout=0.3,
                                   recurrent_dropout=0.2, rng=rng,
                                   remat_chunk=chunk)
        return jnp.mean(jnp.square(pred[..., 0] - y))

    for loss, params in ((dense_loss, dense), (sing_loss, sp)):
        g0 = jax.grad(lambda p: loss(p, 0))(params)
        g1 = jax.grad(lambda p: loss(p, 10))(params)
        for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_resolver_applies_and_warns():
    """Wiring proof (loss parity alone cannot detect the knob being
    silently dropped — remat is value-identical by design): the shared
    resolver must return a remat-carrying partial for the stock scans,
    accept a wrapper that baked the knob in, and WARN for any apply_fn
    that cannot carry it."""
    import functools
    import warnings

    from svd_lstm_tpu.config import FactorConfig
    from svd_lstm_tpu.models.singular import singular_lstm_apply
    from svd_lstm_tpu.train.finetune import dropout_apply_fn
    from svd_lstm_tpu.train.loop import resolve_train_apply_fn

    cfg = TrainConfig(remat_chunk=16)
    for stock in (stacked_lstm_apply, singular_lstm_apply):
        fn, using_kernel = resolve_train_apply_fn(cfg, stock)
        assert isinstance(fn, functools.partial)
        assert fn.keywords["remat_chunk"] == 16 and not using_kernel

    # dropout wrapper built WITH the knob: accepted silently
    wrapped, _ = dropout_apply_fn(FactorConfig(dropout=0.2), seed=0, remat_chunk=16)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        fn, _ = resolve_train_apply_fn(cfg, wrapped)
    assert fn is wrapped

    # custom apply_fn that can't carry the knob: warns, runs without remat
    custom = lambda p, x, return_sequences=True, rng=None: None  # noqa: E731
    with pytest.warns(UserWarning, match="remat_chunk"):
        fn, _ = resolve_train_apply_fn(cfg, custom)
    assert fn is custom


def test_dropout_finetune_remat_matches_plain():
    """remat_chunk now reaches the DROPOUT fine-tune through the wrapper
    (review finding: it used to be silently dropped): identical history."""
    from svd_lstm_tpu.config import FactorConfig
    from svd_lstm_tpu.factor.svd import make_singular_model
    from svd_lstm_tpu.train.finetune import finetune

    rng = np.random.default_rng(3)
    X = rng.normal(size=(1, 300, 8)).astype(np.float32)
    y = rng.normal(size=(300,)).astype(np.float32)
    dense = init_stacked_lstm(jax.random.PRNGKey(0), input_dim=8, units=(12,))
    sp = make_singular_model(dense)
    fcfg = FactorConfig(hoyer=0.01, dropout=0.2)
    kw = dict(num_windows=8, window_len=40, batch_size=4, epochs=2)

    base = finetune(sp, X, y, fcfg, TrainConfig(**kw))
    remat = finetune(sp, X, y, fcfg, TrainConfig(**kw, remat_chunk=13))
    np.testing.assert_allclose(remat.history, base.history, rtol=1e-5)


def test_fit_dp_honors_remat_chunk():
    """The dp loop takes the same chunked apply: history matches the
    single-device remat fit to reduction-order noise."""
    from svd_lstm_tpu.parallel.fit import fit_dp
    from svd_lstm_tpu.parallel.mesh import make_mesh
    from svd_lstm_tpu.train.loop import fit

    rng = np.random.default_rng(2)
    X = rng.normal(size=(1, 400, 8)).astype(np.float32)
    y = rng.normal(size=(400,)).astype(np.float32)
    params = init_stacked_lstm(jax.random.PRNGKey(0), input_dim=8, units=(12,))
    cfg = TrainConfig(num_windows=16, window_len=48, batch_size=8, epochs=2,
                      remat_chunk=16)

    r_one = fit(params, X, y, cfg)
    r_dp = fit_dp(params, X, y, make_mesh(dp=8, tp=1), cfg=cfg)
    np.testing.assert_allclose(r_dp.history, r_one.history, rtol=1e-4)


def test_fit_honors_remat_chunk():
    """TrainConfig.remat_chunk routes the train step through the chunked
    apply; losses match the plain run (identical arithmetic)."""
    from svd_lstm_tpu.train.loop import fit

    rng = np.random.default_rng(0)
    X = rng.normal(size=(1, 400, 8)).astype(np.float32)
    y = rng.normal(size=(400,)).astype(np.float32)
    params = init_stacked_lstm(jax.random.PRNGKey(0), input_dim=8, units=(12,))

    base = fit(params, X, y, TrainConfig(num_windows=8, window_len=50,
                                         batch_size=4, epochs=2))
    remat = fit(params, X, y, TrainConfig(num_windows=8, window_len=50,
                                          batch_size=4, epochs=2,
                                          remat_chunk=16))
    np.testing.assert_allclose(remat.history, base.history, rtol=1e-5)
