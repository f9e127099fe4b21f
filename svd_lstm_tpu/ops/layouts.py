"""Kernel-layout transformations for reduced models.

A reduced model's *parameterization* (the exact two-step (B, C) pairs —
reference code/svd_classes_v3.py:604-676) is independent of the *kernel
layout* it executes in. On TPU the best batch-1 layout differs from the
storage layout:

* **x-side (input projections)**: stays factored — these run as big
  (T × d) @ (d × r) @ (r × ·) MXU matmuls over the whole sequence, where
  the rank reduction is a real FLOP/bandwidth win.
* **h-side (recurrence)**: executed *dense-reconstructed*: the per-step
  chain is latency-bound (~300 ns/layer-step on v5e regardless of n ≤ 128),
  so two dependent matvecs always lose to one. ``U_rec = B @ [I|C]`` is
  algebraically exact (same outputs bit-for-bit up to one matmul rounding),
  costs one dot per step — identical latency to the full model, in place of
  the reference's 1.31× slowdown.

This is measured, not assumed: see BENCH notes — split two-step recurrence
was 2.4–5.2× and merged two-step 1.31× the dense step on v5e; the
reconstruction gives 1.00× by construction while keeping the compressed
storage (r·(m+n−r) weights) and the factored x-side savings.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from svd_lstm_tpu.models.lstm import gate_update
from svd_lstm_tpu.models.reduced import ReducedModelParams, reduced_projection
from svd_lstm_tpu.ops.pallas_lstm import fold_IC, lstm_recurrence_pallas


def reconstruct_recurrent_dense(layer, precision=None) -> jax.Array:
    """(n, 4n) dense recurrent kernel from (B, C) pairs — exact."""
    if layer.split:
        blocks = [
            jnp.dot(B, fold_IC(B, C), precision=precision)
            for B, C in zip(layer.uB, layer.uC)
        ]
        return jnp.concatenate(blocks, axis=1)
    return jnp.dot(layer.uB, fold_IC(layer.uB, layer.uC), precision=precision)


def reconstruct_dense_model(params: ReducedModelParams, precision=None):
    """Exact dense StackedLSTMParams from a reduced model (both sides
    reconstructed). The compressed parameterization remains the stored
    form; this is purely an execution layout: at the reference's scale the
    whole forward is latency/bandwidth-bound and dense kernels are the
    fastest exact evaluation of the truncated model.

    ``precision`` pins the reconstruction dots (the differentiable training
    view passes HIGHEST: the product IS the model's weight matrix, so an
    ambient bf16 scope must not perturb it); None uses the package default
    (f32 matmul precision, set at import)."""
    from svd_lstm_tpu.models.lstm import LSTMLayerParams, StackedLSTMParams

    layers = []
    for l in params.layers:
        if l.split:
            Wb = [
                jnp.dot(B, fold_IC(B, C), precision=precision)
                for B, C in zip(l.wB, l.wC)
            ]
            W = jnp.concatenate(Wb, axis=1)
        else:
            W = jnp.dot(l.wB, fold_IC(l.wB, l.wC), precision=precision)
        layers.append(
            LSTMLayerParams(
                W=W, U=reconstruct_recurrent_dense(l, precision), b=l.b
            )
        )
    return StackedLSTMParams(layers=tuple(layers), head=params.head)


def singular_forward_fused(
    smodel, x: jax.Array, interpret: bool = False, dot_precision=None
) -> jax.Array:
    """Fastest batch-1 evaluation of a (full-rank) singular model: exact
    dense collapse W = (U·Σ)·Vᵀ through the fused kernel. x: (T, d)."""
    from svd_lstm_tpu.factor.svd import singular_to_dense
    from svd_lstm_tpu.ops.pallas_lstm import fused_dense_stack_pallas

    return fused_dense_stack_pallas(
        singular_to_dense(smodel), x, interpret=interpret, dot_precision=dot_precision
    )


def reduced_forward_fused(
    params: ReducedModelParams,
    x: jax.Array,
    interpret: bool = False,
    dot_precision=None,
) -> jax.Array:
    """Fastest batch-1 whole-run evaluation of a reduced model: dense
    reconstruction (exact) through the fused compact-weight Pallas kernel.
    x: (T, d) -> (T, head_dim)."""
    from svd_lstm_tpu.ops.pallas_lstm import fused_dense_stack_pallas

    return fused_dense_stack_pallas(
        reconstruct_dense_model(params),
        x,
        interpret=interpret,
        dot_precision=dot_precision,
    )


def reduced_forward_dense_recurrent(
    params: ReducedModelParams,
    x_seq: jax.Array,
    return_sequences: bool = True,
    use_pallas: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """Reduced-model forward in the TPU batch-1 layout: factored x-side,
    dense-reconstructed h-side. x_seq: (B, T, d) for the scan path, or
    (T, d) when ``use_pallas`` (batch-1 kernel path)."""
    if use_pallas:
        h = x_seq  # (T, d)
        for layer in params.layers:
            xp = reduced_projection(layer, h, "w") + layer.b
            U = reconstruct_recurrent_dense(layer)
            h = lstm_recurrence_pallas(xp, U, interpret=interpret)
        out = h @ params.head.w + params.head.b
        return out if return_sequences else out[-1]

    B, T, _ = x_seq.shape
    h = x_seq
    for layer in params.layers:
        n = layer.units
        xp = reduced_projection(layer, h, "w") + layer.b
        U = reconstruct_recurrent_dense(layer)
        xp_t = jnp.swapaxes(xp, 0, 1)

        def step(carry, xs):
            hh, cc = carry
            hh, cc = gate_update(xs + hh @ U, cc)
            return (hh, cc), hh

        (hT, _), h_seq = jax.lax.scan(
            step, (jnp.zeros((B, n), x_seq.dtype), jnp.zeros((B, n), x_seq.dtype)), xp_t
        )
        h = jnp.swapaxes(h_seq, 0, 1)
    if not return_sequences:
        h = h[:, -1]
    return h @ params.head.w + params.head.b
