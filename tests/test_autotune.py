"""bench.autotune: measured-best impl selection + persistent cache.

On CPU the Pallas candidates fail to lower and must be isolated into
``failed`` while the XLA scan survives and wins — the same mechanism that
on TPU picks the kernel routes by measurement instead of the api table."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import svd_lstm_tpu.bench.autotune as at
from svd_lstm_tpu.api import predict
from svd_lstm_tpu.models.lstm import init_stacked_lstm


@pytest.fixture()
def model_x():
    params = init_stacked_lstm(jax.random.PRNGKey(0), input_dim=4, units=(6, 5))
    x = jax.random.normal(jax.random.PRNGKey(1), (12, 4))
    return params, x


def test_candidates_follow_api_rules(model_x):
    params, x = model_x
    assert at.candidates(params, x) == ["scan", "fused", "hybrid"]
    wide = init_stacked_lstm(jax.random.PRNGKey(0), input_dim=4, units=(256,))
    assert at.candidates(wide, x) == ["scan", "hybrid"]  # fused is n<=128 only
    xb = x[None]
    assert at.candidates(params, xb) == ["auto", "scan"]


def test_autotune_survives_kernel_failures_and_picks_scan(model_x):
    params, x = model_x
    r = at.autotune(params, x, repeats=1)
    assert "scan" in r.table and r.table[r.impl] == min(r.table.values())
    # off-TPU the Pallas candidates die and are recorded, not raised
    if jax.devices()[0].platform == "cpu":
        assert r.impl in ("scan",) and set(r.failed) == {"fused", "hybrid"}
    assert r.ms > 0


def test_cache_key_distinguishes(model_x):
    params, x = model_x
    other = init_stacked_lstm(jax.random.PRNGKey(0), input_dim=4, units=(6, 6))
    k1 = at.cache_key(params, x, "exact")
    assert k1 == at.cache_key(params, x, "exact")
    assert k1 != at.cache_key(other, x, "exact")
    assert k1 != at.cache_key(params, x[:6], "exact")
    assert k1 != at.cache_key(params, x, "fast")
    # a bf16 input times differently (single-pass dots) — own cache entry
    assert k1 != at.cache_key(params, x.astype(jnp.bfloat16), "exact")


def test_tuned_impl_caches_to_disk_and_memory(model_x, tmp_path, monkeypatch):
    params, x = model_x
    cache = str(tmp_path / "autotune.json")
    monkeypatch.setattr(at, "_MEM_CACHE", {})

    impl = at.tuned_impl(params, x, cache_path=cache)
    assert impl == "scan"
    data = json.load(open(cache))
    assert list(data.values()) == ["scan"]

    # second call must not re-measure: poison autotune
    def boom(*a, **k):
        raise AssertionError("re-measured despite cache")

    monkeypatch.setattr(at, "autotune", boom)
    assert at.tuned_impl(params, x, cache_path=cache) == "scan"
    # disk-only hit (fresh memory cache) also avoids re-measuring
    monkeypatch.setattr(at, "_MEM_CACHE", {})
    assert at.tuned_impl(params, x, cache_path=cache) == "scan"


def test_predict_tuned_matches_predict(model_x, tmp_path, monkeypatch):
    params, x = model_x
    monkeypatch.setattr(at, "_MEM_CACHE", {})
    y = at.predict_tuned(params, x, cache_path=str(tmp_path / "c.json"))
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(predict(params, x, impl="scan")), rtol=1e-6
    )
