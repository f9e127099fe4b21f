"""Real-time streaming inference: state-carrying single-step API.

This is the deployment semantics of the reference's v1 NumPy cells
(code/old_versions/svd_classes.py:104-119: per-sample, state-carrying,
batch-1 — the path exported to LabVIEW/FPGA via the CSV weights) rebuilt as
a functional JAX API: ``state = init_stream(params)``, then
``y, state = stream_step(params, state, frame)`` per incoming frame, all
inside one jitted step.

Works for dense, singular, and reduced models (any pytree with a matching
per-layer step function) and the conv hybrids (``ConvLSTMParams`` /
``ConvSingularParams`` / ``ConvReducedParams`` — the causal conv front end
streams through a ring buffer of the last ``kernel_size`` frames, whose
zero initialization IS the whole-sequence path's causal left-padding, so
step-wise ≡ whole-sequence exactly). Also provides ``stream_many`` — a scan
over a frame block for chunked streaming.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp

from svd_lstm_tpu.models.lstm import gate_update
from svd_lstm_tpu.models.reduced import reduced_projection
from svd_lstm_tpu.models.singular import (
    singular_input_projection,
    singular_recurrent_product,
)

StreamState = Tuple  # per layer (h, c); conv hybrids prepend a frame buffer


def _unpack(params):
    """(conv | None, lstm layers, head) for every supported family."""
    if hasattr(params, "inner"):  # ConvSingularParams / ConvReducedParams
        return params.conv, params.inner.layers, params.inner.head
    if hasattr(params, "conv"):  # ConvLSTMParams
        return params.conv, params.layers, params.head
    return None, params.layers, params.head


def _conv_step(conv, buf, frame):
    """Advance the causal-conv ring buffer one frame and evaluate the conv
    at the newest position: out_t = Σ_j x_{t-k+1+j} @ w[j] + b. The zero
    initial buffer reproduces Keras padding='causal' (conv.py:causal_conv1d
    left-pads k-1 zeros)."""
    buf = jnp.concatenate([buf[:, 1:], frame[:, None, :]], axis=1)
    out = jnp.einsum("bkc,kcf->bf", buf, conv.w) + conv.b
    return jax.nn.relu(out), buf


def init_stream(params, batch: int = 1, dtype=jnp.float32) -> StreamState:
    conv, layers, _ = _unpack(params)
    lstm_state = tuple(
        (jnp.zeros((batch, l.units), dtype), jnp.zeros((batch, l.units), dtype))
        for l in layers
    )
    if conv is None:
        return lstm_state
    k, c_in, _ = conv.w.shape
    return (jnp.zeros((batch, k, c_in), dtype),) + lstm_state


def _layer_step(layer, x, h, c):
    if hasattr(layer, "wB"):  # ReducedLayerParams
        z = reduced_projection(layer, x, "w") + layer.b + reduced_projection(layer, h, "u")
    elif hasattr(layer, "ws"):  # SingularLayerParams
        z = singular_input_projection(layer, x) + singular_recurrent_product(layer, h)
    else:  # dense LSTMLayerParams
        z = x @ layer.W + h @ layer.U + layer.b
    return gate_update(z, c)


def stream_step(params, state: StreamState, frame: jax.Array):
    """One frame in, one prediction out. frame: (batch, d); returns
    (y (batch, head_dim), new_state)."""
    conv, layers, head = _unpack(params)
    x = frame
    new_state: List = []
    if conv is not None:
        x, buf = _conv_step(conv, state[0], frame)
        new_state.append(buf)
        state = state[1:]
    for layer, (h, c) in zip(layers, state):
        h, c = _layer_step(layer, x, h, c)
        new_state.append((h, c))
        x = h
    y = x @ head.w + head.b
    return y, tuple(new_state)


def stream_many(params, state: StreamState, frames: jax.Array):
    """Chunked streaming: frames (batch, K, d) -> (y (batch, K, head_dim),
    state). The scan keeps the chunk on-device in one dispatch."""
    frames_t = jnp.swapaxes(frames, 0, 1)

    def step(st, fr):
        y, st = stream_step(params, st, fr)
        return st, y

    state, ys = jax.lax.scan(step, state, frames_t)
    return jnp.swapaxes(ys, 0, 1), state


def make_stream_fn(params, batch: int = 1, dtype=jnp.float32):
    """Pre-packed streaming closure: returns ``(step_fn, state0)`` with
    ``y, state = step_fn(state, frame)``.

    ``stream_step`` re-derives every execution-layout constant (the split
    reduced form re-pads/folds its factors) inside each call — fine under
    an outer scan where XLA hoists it, but pure per-frame overhead when the
    deployment loop jits the single step (the real-time usage,
    reference old_versions/svd_classes.py:104-119). Here all packing runs
    ONCE at closure build; the returned function is jitted with the packed
    weights baked in as constants.
    """
    from svd_lstm_tpu.models.reduced import (
        apply_split_projection,
        pack_split_projection,
    )

    conv, layers, head = _unpack(params)
    layer_fns = []
    for layer in layers:
        if hasattr(layer, "wB") and layer.split:  # split reduced: pre-pack
            # one shared packing/apply rule with reduced_projection
            packed = {
                "w": pack_split_projection(layer.wB, layer.wC),
                "u": pack_split_projection(layer.uB, layer.uC),
            }

            def step(x, h, c, packed=packed, b=layer.b):
                z = (
                    apply_split_projection(x, *packed["w"])
                    + b
                    + apply_split_projection(h, *packed["u"])
                )
                return gate_update(z, c)

            layer_fns.append(step)
        else:
            def step(x, h, c, layer=layer):
                return _layer_step(layer, x, h, c)

            layer_fns.append(step)

    head_w, head_b = head.w, head.b

    @jax.jit
    def step_fn(state, frame):
        x = frame
        new_state = []
        if conv is not None:
            x, buf = _conv_step(conv, state[0], frame)
            new_state.append(buf)
            state = state[1:]
        for fn, (h, c) in zip(layer_fns, state):
            h, c = fn(x, h, c)
            new_state.append((h, c))
            x = h
        return x @ head_w + head_b, tuple(new_state)

    return step_fn, init_stream(params, batch, dtype)
