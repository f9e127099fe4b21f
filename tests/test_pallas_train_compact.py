"""Compact-layout fused train kernels (ops/pallas_train_compact.py):
interpret-mode forward + gradient parity with autodiff of the f32 scan
(DEF dots are exact f32 on CPU, so tolerances are tight)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from svd_lstm_tpu.models.lstm import init_stacked_lstm, stacked_lstm_apply
from svd_lstm_tpu.ops.pallas_train_compact import (
    compact_eligible,
    fused_narrow_train_apply_compact,
)


@pytest.mark.parametrize("units", [(40, 30, 40), (30, 30), (15, 15, 15)])
def test_compact_forward_matches_scan(rng, units):
    """Mixed gate-group sizes (n=40 -> k=2, n=30/15 -> k=4)."""
    params = init_stacked_lstm(jax.random.PRNGKey(0), input_dim=16, units=units)
    assert compact_eligible(params, 16)
    x = jnp.asarray(rng.normal(size=(8, 7, 16)).astype(np.float32))
    ref = np.asarray(stacked_lstm_apply(params, x, return_sequences=True))
    got = np.asarray(
        fused_narrow_train_apply_compact(params, x, interpret=True)
    )
    np.testing.assert_allclose(got, ref, atol=1e-5)
    last = np.asarray(
        fused_narrow_train_apply_compact(
            params, x, return_sequences=False, interpret=True
        )
    )
    np.testing.assert_allclose(last, ref[:, -1], atol=1e-5)


def test_compact_gradients_match_autodiff(rng):
    params = init_stacked_lstm(
        jax.random.PRNGKey(1), input_dim=16, units=(40, 30, 40)
    )
    x = jnp.asarray(rng.normal(size=(8, 6, 16)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(8,)).astype(np.float32))

    def loss(apply_fn):
        def f(p):
            pred = apply_fn(p, x, return_sequences=False)[..., 0]
            return jnp.mean((pred - y) ** 2)

        return f

    import functools

    g_k = jax.grad(
        loss(functools.partial(fused_narrow_train_apply_compact, interpret=True))
    )(params)
    g_r = jax.grad(loss(stacked_lstm_apply))(params)
    for a, b, path in zip(
        jax.tree.leaves(g_k),
        jax.tree.leaves(g_r),
        jax.tree_util.tree_leaves_with_path(g_r),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5,
            err_msg=jax.tree_util.keystr(path[0]),
        )


def test_compact_gradients_x_and_seq_loss(rng):
    """return_sequences loss (cotangent on every step) + input gradient."""
    params = init_stacked_lstm(jax.random.PRNGKey(2), input_dim=4, units=(40,))
    x = jnp.asarray(rng.normal(size=(8, 5, 4)).astype(np.float32))

    def loss(apply_fn):
        def f(xx):
            return jnp.sum(apply_fn(params, xx, return_sequences=True) ** 2)

        return f

    import functools

    g_k = jax.grad(
        loss(functools.partial(fused_narrow_train_apply_compact, interpret=True))
    )(x)
    g_r = jax.grad(loss(stacked_lstm_apply))(x)
    np.testing.assert_allclose(np.asarray(g_k), np.asarray(g_r), atol=2e-5)


def test_compact_eligibility_rules(rng):
    p65 = init_stacked_lstm(jax.random.PRNGKey(3), input_dim=16, units=(65, 65))
    assert not compact_eligible(p65, 16)  # 2*65 > 128 -> k=1
    p40 = init_stacked_lstm(jax.random.PRNGKey(4), input_dim=16, units=(40,))
    assert compact_eligible(p40, 16)
    assert not compact_eligible(p40, 200)  # input wider than one block


class TestDispatchWiring:
    """TrainConfig.compact_gates routes the dense narrow path through the
    compact kernels (ops/pallas_train.py dispatch + train/loop.py
    resolve_train_apply_fn), falling back to the P-layout when the stack
    cannot pack."""

    def test_fast_train_compact_matches_scan(self, rng):
        from svd_lstm_tpu.ops.pallas_train import stacked_lstm_apply_fast_train

        params = init_stacked_lstm(
            jax.random.PRNGKey(3), input_dim=16, units=(40, 30)
        )
        x = jnp.asarray(rng.normal(size=(8, 6, 16)).astype(np.float32))
        ref = np.asarray(stacked_lstm_apply(params, x, return_sequences=False))
        got = np.asarray(
            stacked_lstm_apply_fast_train(
                params, x, return_sequences=False, interpret=True, compact=True
            )
        )
        np.testing.assert_allclose(got, ref, atol=1e-5)

    def test_fast_train_compact_chunked_past_batch_cliff(self, rng):
        """B > _MAX_WHOLE_BATCH goes through the shared balanced-chunk
        splitter with the compact apply."""
        from svd_lstm_tpu.ops.pallas_train import (
            _MAX_WHOLE_BATCH,
            stacked_lstm_apply_fast_train,
        )

        B = _MAX_WHOLE_BATCH + 8
        params = init_stacked_lstm(jax.random.PRNGKey(4), input_dim=8, units=(12,))
        x = jnp.asarray(rng.normal(size=(B, 4, 8)).astype(np.float32))
        ref = np.asarray(stacked_lstm_apply(params, x, return_sequences=False))
        got = np.asarray(
            stacked_lstm_apply_fast_train(
                params, x, return_sequences=False, interpret=True, compact=True
            )
        )
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, atol=1e-5)

    def test_compact_ineligible_falls_back(self, rng):
        """n=100 packs only one gate per block -> the P-layout path runs
        (same values, no error)."""
        from svd_lstm_tpu.ops.pallas_train import stacked_lstm_apply_fast_train

        params = init_stacked_lstm(
            jax.random.PRNGKey(5), input_dim=8, units=(100,)
        )
        assert not compact_eligible(params, 8)
        x = jnp.asarray(rng.normal(size=(8, 5, 8)).astype(np.float32))
        ref = np.asarray(stacked_lstm_apply(params, x, return_sequences=False))
        got = np.asarray(
            stacked_lstm_apply_fast_train(
                params, x, return_sequences=False, interpret=True, compact=True
            )
        )
        np.testing.assert_allclose(got, ref, atol=1e-5)

    def test_resolve_passes_compact_flag(self):
        from svd_lstm_tpu.config import TrainConfig
        from svd_lstm_tpu.train.loop import resolve_train_apply_fn

        fn, using = resolve_train_apply_fn(
            TrainConfig(recurrence_kernel=True, compact_gates=True),
            stacked_lstm_apply,
        )
        assert using and fn.keywords.get("compact") is True
        # default is the measured batch crossover ("auto" — B>=128 packs,
        # smaller batches keep the P-layout; probe_train_compact_ab.py)
        fn2, _ = resolve_train_apply_fn(
            TrainConfig(recurrence_kernel=True), stacked_lstm_apply
        )
        assert fn2.keywords.get("compact") == "auto"
        fn3, _ = resolve_train_apply_fn(
            TrainConfig(recurrence_kernel=True, compact_gates=False),
            stacked_lstm_apply,
        )
        assert fn3.keywords.get("compact") is False


def test_compact_auto_batch_crossover(rng, monkeypatch):
    """compact="auto" (the default) applies the measured v5e crossover:
    B < 128 keeps the P-layout, B >= 128 routes to the compact kernels
    (scripts/probe_train_compact_ab.py — 0.409 vs 0.657 ms at B=32,
    3.690 vs 4.298 ms at B=512 through this very dispatch)."""
    import svd_lstm_tpu.ops.pallas_train_compact as pc
    from svd_lstm_tpu.ops.pallas_train import stacked_lstm_apply_fast_train

    params = init_stacked_lstm(jax.random.PRNGKey(6), input_dim=6, units=(10,))
    hits = {"n": 0}
    orig = pc.fused_narrow_train_apply_compact

    def spy(*a, **k):
        hits["n"] += 1
        return orig(*a, **k)

    monkeypatch.setattr(pc, "fused_narrow_train_apply_compact", spy)
    x_small = jnp.asarray(rng.normal(size=(8, 3, 6)).astype(np.float32))
    stacked_lstm_apply_fast_train(params, x_small, interpret=True)
    assert hits["n"] == 0  # below the crossover: P-layout
    x_big = jnp.asarray(rng.normal(size=(128, 3, 6)).astype(np.float32))
    stacked_lstm_apply_fast_train(params, x_big, interpret=True)
    assert hits["n"] == 1  # at the crossover: compact
