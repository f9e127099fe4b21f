"""Kernel-accelerated training path for the SVD-factorized (singular) model.

The reference's central compression stage is a 10-epoch fine-tune of the
factorized model (reference code/svd_acceleration_v3.py:119-128). Round 2
left it on the exact XLA scan; this module routes it through the SAME
fused Pallas training kernels the dense trainer uses
(ops/pallas_train.py / ops/pallas_train_fused.py), with exact gradients
for every factor:

    W = (U_w · diag(σ_w)) · V_wᵀ   (per matrix, or per gate when split)

is *linear* in each factor, so reconstructing the dense weights inside
the traced step and differentiating through the reconstruction gives the
exact chain-rule cotangents

    dσ = diag(U_wᵀ · dW · V_w),   dU_w = dW · V_w · diag(σ),
    dV_wᵀ = diag(σ) · U_wᵀ · dW

automatically — the custom-VJP kernels supply dW/dU/db and XLA autodiff
closes the (tiny, once-per-step) reconstruction chain. No factored
recurrence kernel is needed: the reconstruction costs two (d×d)@(d×4n)
dots per layer per step, ~1e-3 of the T=200-step recurrence work, and the
recurrence itself runs at the measured dense-kernel speed (5.42 ms/step
at 4x40/B=512 vs 9.32 f32 scan — BENCH_NOTES §train-kernels).

Reconstruction dots run at HIGHEST precision: their product *is* the
model's weight matrix, so a bf16 pass here would perturb the weights
themselves rather than relax an activation pass (the kernel's activation
dots stay DEFAULT-precision, the ``matmul_precision="bfloat16"`` training
regime this path belongs to).

The σ-only trainable masking stays in the optimizer
(train/finetune.py `make_finetune_optimizer`) — gradients are computed
for every factor and zeroed by the mask, exactly as on the scan path.

Dropout fine-tunes keep the XLA scan: the per-gate mask semantics
(reference code/svd_classes_v3.py:121-137) need the factored forward.

Measured (scripts/probe_singular_finetune_kernel.py, v5e, 4x40/T=200,
full fine-tune step incl. Hoyer + masked adam): **0.448 ms/step vs the
f32 scan's 4.726 and the bf16 scan's 3.317 at B=32** (the reference's
finetune_batch_size) — 10.5×. Known limit of this Mosaic toolchain: for
B >= 512 the (differentiated reconstruction matmuls + fused fwd/bwd
kernel pair) program crashes the remote compiler for EVERY batch size
(HTTP 500, same family as the crash mode documented in
ops/pallas_train.py; measured OK through B=512 (round 5; 496 before the no-copy bwd),
scripts/probe_finetune_b512_{fix,pad}.py). Batches past the boundary therefore run
the kernel over balanced ~256-row independent chunks — 256 is the measured
per-sample sweet spot (8.3 µs/sample vs 10.7 at 496), so the chunked
step at B=512 (4.30 ms) beats even the whole-batch dense-weight kernel
(5.42 ms) and the bf16 scan (13.4 ms) — probe_finetune_b512_chunk.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from svd_lstm_tpu.models.lstm import LSTMLayerParams, StackedLSTMParams
from svd_lstm_tpu.models.singular import SingularModelParams

HIGHEST = jax.lax.Precision.HIGHEST

def chunked_fast_train(
    dense: StackedLSTMParams,
    x_seq: jax.Array,
    return_sequences: bool = True,
    interpret: bool = False,
) -> jax.Array:
    """Fused-kernel training forward over a *reconstructed* dense view.

    Narrow stacks route to ``stacked_lstm_apply_fast_train``, whose
    dispatch batch-chunks B > 512 into balanced ~256-row independent
    kernel instances — near the measured per-sample optimum AND the fix
    for the B >= 512 reconstruction-fed compiler cliff (module docstring;
    chunk gradients are exact, pad rows get zero cotangent). Non-narrow
    (>128-unit) stacks above B=128 keep the exact XLA scan: the chunking
    evidence only covers the narrow fused kernels, and wide
    reconstruction-fed programs have their own unmapped crash modes.
    """
    from svd_lstm_tpu.ops.pallas_train import is_narrow, stacked_lstm_apply_fast_train

    narrow = is_narrow(dense, x_seq.shape[-1])
    if not narrow and x_seq.shape[0] > 128:
        from svd_lstm_tpu.models.lstm import stacked_lstm_apply

        return stacked_lstm_apply(dense, x_seq, return_sequences)
    return stacked_lstm_apply_fast_train(
        dense, x_seq, return_sequences=return_sequences, interpret=interpret
    )


def _dense_matrix(left, sigma, right):
    """(left · diag(sigma)) · right, merged (2-D) or per-gate (3-D stacked).

    merged: left (d, k), sigma (k,), right (k, 4n) -> (d, 4n)
    split:  left (4, d, k), sigma (4, k), right (4, k, n) -> (d, 4n)
            with gate blocks [i|f|c|o] concatenated along columns, matching
            the Keras layout models/lstm.py stores (reference
            code/svd_classes_v3.py:146-232 keeps per-gate factors).
    """
    if left.ndim == 3:
        scaled = left * sigma[:, None, :]                      # (4, d, k)
        per_gate = jnp.einsum("gdk,gkn->gdn", scaled, right,
                              precision=HIGHEST)               # (4, d, n)
        d = per_gate.shape[1]
        return jnp.transpose(per_gate, (1, 0, 2)).reshape(d, -1)
    return jnp.dot(left * sigma, right, precision=HIGHEST)


def singular_dense_view(sparams: SingularModelParams) -> StackedLSTMParams:
    """Traced, differentiable dense reconstruction of a singular model.

    Same math as ``factor.svd.singular_to_dense`` (which shares
    ``_dense_matrix`` but casts to a target dtype for export); this
    cast-free view is the gradient path — dW/dU from the dense kernels
    flows back to (wl, ws, wr, ul, us, ur) — the factored-training
    replacement for the reference's per-weight ``trainable`` flags
    (reference code/svd_classes_v3.py:51-112).
    """
    layers = tuple(
        LSTMLayerParams(
            W=_dense_matrix(p.wl, p.ws, p.wr),
            U=_dense_matrix(p.ul, p.us, p.ur),
            b=p.b,
        )
        for p in sparams.layers
    )
    return StackedLSTMParams(layers=layers, head=sparams.head)


def singular_lstm_apply_fast_train(
    sparams: SingularModelParams,
    x_seq: jax.Array,
    return_sequences: bool = True,
    interpret: bool = False,
) -> jax.Array:
    """Drop-in ``apply_fn`` for ``train.loop.fit`` running the singular
    fine-tune through the fused dense training kernels.

    Replaces the reference fine-tune stage's compute
    (code/svd_acceleration_v3.py:119-128) at kernel speed; gradient parity
    with autodiff of ``singular_lstm_apply`` is asserted in
    tests/test_singular_train_kernel.py.
    """
    return chunked_fast_train(
        singular_dense_view(sparams),
        x_seq,
        return_sequences=return_sequences,
        interpret=interpret,
    )
