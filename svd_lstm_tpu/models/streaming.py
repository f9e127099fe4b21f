"""Real-time streaming inference: state-carrying single-step API.

This is the deployment semantics of the reference's v1 NumPy cells
(code/old_versions/svd_classes.py:104-119: per-sample, state-carrying,
batch-1 — the path exported to LabVIEW/FPGA via the CSV weights) rebuilt as
a functional JAX API: ``state = init_stream(params)``, then
``y, state = stream_step(params, state, frame)`` per incoming frame, all
inside one jitted step.

Works for dense, singular, and reduced models (any pytree with a matching
per-layer step function). Also provides ``stream_many`` — a scan over a
frame block for chunked streaming.
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

StreamState = Tuple[Tuple[jax.Array, jax.Array], ...]  # per layer (h, c)


def init_stream(params, batch: int = 1, dtype=jnp.float32) -> StreamState:
    return tuple(
        (jnp.zeros((batch, l.units), dtype), jnp.zeros((batch, l.units), dtype))
        for l in params.layers
    )


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
    x = frame
    new_state: List[Tuple[jax.Array, jax.Array]] = []
    for layer, (h, c) in zip(params.layers, state):
        h, c = _layer_step(layer, x, h, c)
        new_state.append((h, c))
        x = h
    y = x @ params.head.w + params.head.b
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

    layer_fns = []
    for layer in params.layers:
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

    head_w, head_b = params.head.w, params.head.b

    @jax.jit
    def step_fn(state, frame):
        x = frame
        new_state = []
        for fn, (h, c) in zip(layer_fns, state):
            h, c = fn(x, h, c)
            new_state.append((h, c))
            x = h
        return x @ head_w + head_b, tuple(new_state)

    return step_fn, init_stream(params, batch, dtype)
