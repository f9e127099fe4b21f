"""JSON weight export, json_to_csv, devtime on CPU."""

import json
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from svd_lstm_tpu.bench.devtime import device_time_ms
from svd_lstm_tpu.io.csv_weights import json_to_csv, save_model_weights_as_json
from svd_lstm_tpu.models.lstm import init_stacked_lstm


def test_json_export_roundtrip(tmp_path):
    params = init_stacked_lstm(jax.random.PRNGKey(0), 4, (6,))
    p = str(tmp_path / "w.json")
    save_model_weights_as_json(params, p)
    with open(p) as f:
        data = json.load(f)
    assert set(data) == {"layer0", "layer1"}
    W = np.asarray(data["layer0"][0])
    np.testing.assert_allclose(W, np.asarray(params.layers[0].W), rtol=1e-6)


def test_json_to_csv(tmp_path):
    src = str(tmp_path / "data.json")
    with open(src, "w") as f:
        json.dump({"a": [1.0, 2.0, 3.0], "b": "not a list", "c": [[1, 2], [3, 4]]}, f)
    out = str(tmp_path / "csvs")
    json_to_csv(src, out)
    assert np.loadtxt(os.path.join(out, "a.csv"), delimiter=",").shape == (3,)
    assert np.loadtxt(os.path.join(out, "c.csv"), delimiter=",").shape == (2, 2)
    assert not os.path.exists(os.path.join(out, "b.csv"))


def test_device_time_ms_cpu():
    f = jax.jit(lambda x: jnp.tanh(x @ x).sum())
    x = jnp.ones((256, 256))
    ms = device_time_ms(f, x, repeats=2)
    assert 0 < ms < 10_000
