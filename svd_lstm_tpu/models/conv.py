"""Causal-Conv1D + LSTM hybrid regressor.

Parity with the reference's convolutional experiment
(code/old_versions/toy-convolution.py:70-76): Conv1D(filters=15,
kernel_size=10, padding='causal', relu) feeding two stacked 15-unit LSTMs
and a time-distributed Dense(1) head. The conv front-end is a single
``lax.conv_general_dilated`` over the whole sequence — exactly the kind of
large static op XLA tiles well on the MXU.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from svd_lstm_tpu.models.lstm import (
    DenseParams,
    LSTMLayerParams,
    _glorot_uniform,
    init_lstm_layer,
    lstm_layer_apply,
)


class ConvParams(NamedTuple):
    w: jax.Array  # (kernel_size, in_channels, filters)
    b: jax.Array  # (filters,)


class ConvLSTMParams(NamedTuple):
    conv: ConvParams
    layers: Tuple[LSTMLayerParams, ...]
    head: DenseParams


def causal_conv1d(p: ConvParams, x: jax.Array) -> jax.Array:
    """x: (B, T, C) -> (B, T, filters); left-padded so step t sees only
    inputs ≤ t (Keras padding='causal')."""
    k = p.w.shape[0]
    out = jax.lax.conv_general_dilated(
        x,
        p.w,
        window_strides=(1,),
        padding=[(k - 1, 0)],
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    return out + p.b


def init_conv_lstm(
    key,
    in_channels: int = 1,
    filters: int = 15,
    kernel_size: int = 10,
    units: Sequence[int] = (15, 15),
    head_dim: int = 1,
    dtype=jnp.float32,
) -> ConvLSTMParams:
    keys = jax.random.split(key, len(units) + 2)
    # Keras glorot for conv kernels: fan_in = kernel_size*in_channels,
    # fan_out = kernel_size*filters (receptive-field-scaled, NOT the flat
    # (rows, cols) rule — that gave a ~2.5x wider init than the reference
    # conv experiment, old_versions/toy-convolution.py)
    fan_in = kernel_size * in_channels
    fan_out = kernel_size * filters
    limit = float(np.sqrt(6.0 / (fan_in + fan_out)))
    wk = jax.random.uniform(
        keys[0], (kernel_size, in_channels, filters), dtype, -limit, limit
    )
    conv = ConvParams(w=wk, b=jnp.zeros((filters,), dtype))
    layers = []
    d = filters
    for k_, n in zip(keys[1:-1], units):
        layers.append(init_lstm_layer(k_, d, n, dtype))
        d = n
    head = DenseParams(
        w=_glorot_uniform(keys[-1], (d, head_dim), dtype),
        b=jnp.zeros((head_dim,), dtype),
    )
    return ConvLSTMParams(conv=conv, layers=tuple(layers), head=head)


def conv_lstm_apply(
    params: ConvLSTMParams, x_seq: jax.Array, return_sequences: bool = True
) -> jax.Array:
    h = jax.nn.relu(causal_conv1d(params.conv, x_seq))
    for layer in params.layers:
        h = lstm_layer_apply(layer, h)
    if not return_sequences:
        h = h[:, -1]
    return h @ params.head.w + params.head.b
