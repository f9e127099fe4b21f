"""CLI surface: the `export` subcommand (checkpoint -> deployment artifacts,
the reference's LabVIEW export role, code/load_preprocess.py:80-165)."""

import os

import numpy as np
import jax

from svd_lstm_tpu.__main__ import _export
from svd_lstm_tpu.io.checkpoint import load_params, save_params
from svd_lstm_tpu.io.csv_weights import load_model_from_csv
from svd_lstm_tpu.models.lstm import init_stacked_lstm
from svd_lstm_tpu.utils.quantize import QuantizedTensor


def test_export_command_roundtrip(tmp_path):
    params = init_stacked_lstm(jax.random.PRNGKey(0), input_dim=4, units=(6, 5))
    ckpt = str(tmp_path / "model.npz")
    save_params(ckpt, params)
    outdir = str(tmp_path / "deploy")

    _export([ckpt, outdir, "--json", "--int8"])

    # per-gate CSVs reassemble into the same model
    loaded = load_model_from_csv(outdir, transposed=False)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(loaded)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)

    assert os.path.exists(os.path.join(outdir, "model_weights.json"))

    q = load_params(os.path.join(outdir, "model_int8.npz"))
    assert isinstance(q.layers[0].W, QuantizedTensor)


def test_tune_command_prints_table_and_caches(tmp_path, capsys, monkeypatch):
    """CLI tune: measures valid impls for a checkpoint, prints the table
    with a winner, memoizes to the autotune cache."""
    import svd_lstm_tpu.bench.autotune as at
    from svd_lstm_tpu.__main__ import _tune

    params = init_stacked_lstm(jax.random.PRNGKey(1), input_dim=4, units=(6,))
    ckpt = str(tmp_path / "m.npz")
    save_params(ckpt, params)
    cache = str(tmp_path / "autotune.json")
    monkeypatch.setattr(at, "default_cache_path", lambda: cache)
    _tune(["--checkpoint", ckpt, "--steps", "16", "--repeats", "1"])
    out = capsys.readouterr().out
    assert "winner" in out and "scan" in out
    assert os.path.exists(cache)
