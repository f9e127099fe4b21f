"""Per-gate CSV weight export/import — LabVIEW-deployment parity.

The reference ships per-gate CSV dumps for a LabVIEW real-time consumer
(reference code/load_preprocess.py:93-126; shipped artifacts
code/model_weights/lstm_{69,70,71}/ + dense_top/). File layout per LSTM
layer directory:

    Wi.csv Wf.csv Wc.csv Wo.csv   — input kernel gate blocks
    Ui.csv Uf.csv Uc.csv Uo.csv   — recurrent kernel gate blocks
    bi.csv bf.csv bc.csv bo.csv   — bias gate segments

The reference's ``save_model_weights_as_csv`` writes the *untransposed*
Keras blocks ``W[:, g*n:(g+1)*n]`` of shape (in_dim, units); the shipped
lstm_69 fixtures are however stored transposed, (units × in_dim) — produced
by the older row-convention path (reference old_versions/svd_classes.py:125
"I believe these must be transposed"). The loader accepts either via
``transposed=``, defaulting to the shipped-fixture convention so the
artifacts under model_weights/ load directly.
"""

from __future__ import annotations

import os
from typing import Sequence

import jax.numpy as jnp
import numpy as np

from svd_lstm_tpu.models.lstm import DenseParams, LSTMLayerParams, StackedLSTMParams

GATES = ("i", "f", "c", "o")


_LAYOUT_MARKER = "layout.txt"


def save_conv_front_csv(conv, savpath: str) -> None:
    """Write a causal-conv front end as ``conv/`` next to the lstm_* dirs:
    w.csv ((k·c_in) × filters, tap-major rows), b.csv, shape.csv (k, c_in).
    The native runtime auto-detects the directory (svdlstm_runtime.cpp
    load_conv)."""
    d = os.path.join(savpath, "conv")
    os.makedirs(d, exist_ok=True)
    w = np.asarray(conv.w)  # (k, c_in, filters)
    k, c_in, filters = w.shape
    np.savetxt(os.path.join(d, "w.csv"), w.reshape(k * c_in, filters), delimiter=",")
    np.savetxt(os.path.join(d, "b.csv"), np.asarray(conv.b), delimiter=",")
    np.savetxt(os.path.join(d, "shape.csv"), np.array([[k, c_in]]), delimiter=",")


def load_conv_front_csv(savpath: str, dtype=jnp.float32):
    """Load a ``conv/`` front-end directory if present; None otherwise."""
    from svd_lstm_tpu.models.conv import ConvParams

    d = os.path.join(savpath, "conv")
    if not os.path.isdir(d):
        return None
    w = np.loadtxt(os.path.join(d, "w.csv"), delimiter=",", ndmin=2)
    b = np.atleast_1d(np.loadtxt(os.path.join(d, "b.csv"), delimiter=","))
    shape = np.loadtxt(os.path.join(d, "shape.csv"), delimiter=",").reshape(-1)
    k, c_in = int(shape[0]), int(shape[1])
    if w.shape[0] != k * c_in:
        raise ValueError(
            f"{d}/w.csv has {w.shape[0]} rows; shape.csv says k*c_in = {k * c_in}"
        )
    return ConvParams(
        w=jnp.asarray(w.reshape(k, c_in, -1), dtype), b=jnp.asarray(b, dtype)
    )


def save_model_weights_as_csv(
    params, savpath: str = "./model_weights"
) -> None:
    """Write per-gate CSVs, one directory per layer plus ``dense_top/``.

    Blocks are written UNTRANSPOSED (Keras (in_dim, units) orientation,
    like the reference's own writer); a ``layout.txt`` marker records this
    so ``load_model_from_csv``'s auto mode round-trips correctly even
    though bare fixture directories (no marker) default to the shipped
    transposed convention.

    Accepts ``ConvLSTMParams`` too — the conv front end goes to ``conv/``
    (``save_conv_front_csv``) and the LSTM stack to the usual layout."""
    os.makedirs(savpath, exist_ok=True)
    with open(os.path.join(savpath, _LAYOUT_MARKER), "w") as f:
        f.write("keras\n")  # untransposed (in_dim, units) blocks
    if hasattr(params, "conv"):  # ConvLSTMParams
        save_conv_front_csv(params.conv, savpath)
    for li, layer in enumerate(params.layers):
        d = os.path.join(savpath, f"lstm_{li}")
        os.makedirs(d, exist_ok=True)
        W = np.asarray(layer.W)
        U = np.asarray(layer.U)
        b = np.asarray(layer.b)
        n = layer.units
        for g, name in enumerate(GATES):
            np.savetxt(os.path.join(d, f"W{name}.csv"), W[:, g * n : (g + 1) * n], delimiter=",")
            np.savetxt(os.path.join(d, f"U{name}.csv"), U[:, g * n : (g + 1) * n], delimiter=",")
            np.savetxt(os.path.join(d, f"b{name}.csv"), b[g * n : (g + 1) * n], delimiter=",")
    d = os.path.join(savpath, "dense_top")
    os.makedirs(d, exist_ok=True)
    np.savetxt(os.path.join(d, "weights.csv"), np.asarray(params.head.w), delimiter=",")
    np.savetxt(os.path.join(d, "bias.csv"), np.asarray(params.head.b), delimiter=",")


def _load_gate(path: str) -> np.ndarray:
    return np.atleast_1d(np.loadtxt(path, delimiter=","))


def _load_gate_matrix(path: str) -> np.ndarray:
    # ndmin=2 preserves orientation for single-column blocks: a (k, 1)
    # file loads as (k, 1), where atleast_2d(loadtxt(...)) would collapse
    # it to (1, k) and silently transpose units=1 / in_dim=1 layers
    return np.loadtxt(path, delimiter=",", ndmin=2)


def load_layer_from_csv(
    layer_dir: str, transposed: bool = True, dtype=jnp.float32
) -> LSTMLayerParams:
    """Load one layer directory of per-gate CSVs into Keras-layout params.

    transposed=True (default): files store (units, in_dim) blocks as in the
    shipped reference fixtures (code/model_weights/lstm_69/Wi.csv is 15×16).
    """
    Wg, Ug, bg = [], [], []
    for name in GATES:
        W = _load_gate_matrix(os.path.join(layer_dir, f"W{name}.csv"))
        U = _load_gate_matrix(os.path.join(layer_dir, f"U{name}.csv"))
        b = _load_gate(os.path.join(layer_dir, f"b{name}.csv"))
        if transposed:
            W, U = W.T, U.T
        Wg.append(W)
        Ug.append(U)
        bg.append(b)
    return LSTMLayerParams(
        W=jnp.asarray(np.concatenate(Wg, axis=1), dtype),
        U=jnp.asarray(np.concatenate(Ug, axis=1), dtype),
        b=jnp.asarray(np.concatenate(bg), dtype),
    )


def list_layer_dirs(savpath: str) -> list:
    """``lstm_*`` subdirectories of a weight-export directory in layer
    order. Numeric-suffix sort: plain sorted() is lexicographic, which puts
    lstm_10 between lstm_1 and lstm_2 and silently scrambles the layer
    order of 11+-layer models; non-numeric suffixes sort after, by name."""
    def _order(d):
        suffix = d[len("lstm_"):]
        return (0, int(suffix), d) if suffix.isdigit() else (1, 0, d)

    return sorted(
        (
            d for d in os.listdir(savpath)
            if d.startswith("lstm_") and os.path.isdir(os.path.join(savpath, d))
        ),
        key=_order,
    )


def load_model_from_csv(
    savpath: str,
    layer_dirs: Sequence[str] | None = None,
    dense_dir: str = "dense_top",
    transposed: bool | None = None,
    dtype=jnp.float32,
) -> StackedLSTMParams:
    """Load a whole stacked model from a model_weights/-style directory.

    ``layer_dirs`` default: every ``lstm_*`` subdirectory in name order
    (matches the reference's lstm_69/lstm_70/lstm_71 layout).

    ``transposed=None`` (default) auto-detects: a directory written by
    ``save_model_weights_as_csv`` carries a ``layout.txt`` marker and loads
    untransposed; a bare fixture directory (the shipped reference
    artifacts) falls back to the transposed convention. This makes the
    default save → default load round-trip correct — square gate blocks
    would otherwise silently load as their transposes."""
    if transposed is None:
        transposed = not os.path.exists(os.path.join(savpath, _LAYOUT_MARKER))
    if layer_dirs is None:
        layer_dirs = list_layer_dirs(savpath)
    layers = tuple(
        load_layer_from_csv(os.path.join(savpath, d), transposed, dtype)
        for d in layer_dirs
    )
    w = np.atleast_1d(np.loadtxt(os.path.join(savpath, dense_dir, "weights.csv"), delimiter=","))
    b = np.atleast_1d(np.loadtxt(os.path.join(savpath, dense_dir, "bias.csv"), delimiter=","))
    if w.ndim == 1:
        w = w[:, None]
    head = DenseParams(w=jnp.asarray(w, dtype), b=jnp.asarray(b.reshape(-1), dtype))
    conv = load_conv_front_csv(savpath, dtype)
    if conv is not None:
        from svd_lstm_tpu.models.conv import ConvLSTMParams

        return ConvLSTMParams(conv=conv, layers=layers, head=head)
    return StackedLSTMParams(layers=layers, head=head)


def save_model_weights_as_json(params: StackedLSTMParams, savpath: str = "model_weights.json") -> None:
    """Whole-model JSON dump (reference load_preprocess.py:80-90)."""
    import json

    data = {}
    for i, layer in enumerate(params.layers):
        data[f"layer{i}"] = [
            np.asarray(layer.W).tolist(),
            np.asarray(layer.U).tolist(),
            np.asarray(layer.b).tolist(),
        ]
    data[f"layer{len(params.layers)}"] = [
        np.asarray(params.head.w).tolist(),
        np.asarray(params.head.b).tolist(),
    ]
    with open(savpath, "w", encoding="utf-8") as f:
        json.dump(data, f, ensure_ascii=False, indent=4)


def json_to_csv(json_file: str, savpath: str) -> None:
    """Dump every list-valued entry of a JSON file to <name>.csv
    (reference load_preprocess.py:130-143 — LabVIEW prefers CSVs).

    The reference's version breaks on its own ``save_model_weights_as_json``
    output (the per-layer [W, U, b] entries are ragged; upstream comment:
    "I don't think this actually works properly"). Here ragged entries
    split into ``<name>_<j>.csv`` per component instead of raising."""
    import json

    with open(json_file) as f:
        data = json.load(f)
    os.makedirs(savpath, exist_ok=True)
    for name, dataset in data.items():
        if not isinstance(dataset, list):
            continue
        try:
            arr = np.asarray(dataset, dtype=np.float64)
        except ValueError:
            arr = None  # inhomogeneous (e.g. a [W, U, b] layer entry)
        if arr is not None and arr.dtype != object:
            np.savetxt(os.path.join(savpath, f"{name}.csv"), arr, delimiter=",")
        else:
            for j, part in enumerate(dataset):
                np.savetxt(
                    os.path.join(savpath, f"{name}_{j}.csv"),
                    np.asarray(part, dtype=np.float64),
                    delimiter=",",
                )


def predictions_to_csv(path: str, y: np.ndarray) -> None:
    """Persist a whole-run prediction, parity with the shipped
    ``model_prediction.csv`` fixture (29 700 rows, one float per line)."""
    np.savetxt(path, np.asarray(y).reshape(-1), delimiter=",")


def preprocessed_to_csv(savpath: str, t: np.ndarray, y: np.ndarray, X: np.ndarray | None = None) -> None:
    """Persist preprocessed series, parity with
    ``preprocessed_DROPBEAR_{t,y,X}.csv`` (reference load_preprocess.py:146-165)."""
    os.makedirs(savpath, exist_ok=True)
    np.savetxt(os.path.join(savpath, "preprocessed_DROPBEAR_t.csv"), np.asarray(t).reshape(-1), delimiter=",")
    np.savetxt(os.path.join(savpath, "preprocessed_DROPBEAR_y.csv"), np.asarray(y).reshape(-1), delimiter=",")
    if X is not None:
        np.savetxt(os.path.join(savpath, "preprocessed_DROPBEAR_X.csv"), np.asarray(X).reshape(X.shape[-2] if X.ndim == 3 else X.shape[0], -1), delimiter=",")
