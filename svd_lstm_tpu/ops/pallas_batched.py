"""Batched-throughput Pallas LSTM recurrence with VMEM-resident weights.

The batched ``precision="fast"`` path (api.predict) ran its recurrences as
XLA scans whose per-step (B, n) @ (n, 4n) dot re-streams the recurrent
matrix from HBM every timestep: measured ~97 GFLOP/ms (~50% of the v5e
bf16 peak) at the 3x512/B=256 benchmark point — the 2 MB weight stream
(~2.5 us @ 800 GB/s) sits unoverlapped next to ~2.7 us of MXU work
(scripts/probe_int8_matmul_raw.py, probe_batched_recurrence.py).

This kernel keeps U resident in VMEM across the whole sequence and streams
only the hoisted input projections, one (B, 4n) block per grid step:
measured 0.383 ms vs the XLA scan's 1.165 ms for one n=512 layer
(B=256, T=128) — 3.0 us/step, essentially the MXU bound.

Design constraints discovered by probing (scripts/probe_batched_recurrence.py):

* bf16 **dots** inside Pallas crash this Mosaic toolchain (same compiler
  scheduling bug as the batch-1 kernels, scripts/probe_precision.py). The
  kernel therefore stores f32 weights/state and issues the dot with
  ``precision=DEFAULT``, which lowers to the MXU's native single-pass
  bf16-multiply/f32-accumulate — bf16 speed, and strictly *better*
  accuracy than the XLA fast path's all-bf16 arithmetic. (The package
  default ``jax_default_matmul_precision=float32`` would force 3-pass
  emulation at ~4x the cost; DEFAULT must be explicit here.)
* bf16 **loads** are fine: xp streams as bf16 (half the HBM traffic) and
  widens to f32 right after the load.
* A static multi-step unroll inside a multi-iteration grid also crashes
  the toolchain (probe bisect) — so the time axis advances one step per
  grid iteration, which is fully pipelined anyway (input/output blocks
  double-buffer against the sequential grid).

Reference role: this is the batched analog of ops/pallas_lstm.py's
batch-1 kernels — the throughput path the reference never had (its
custom cells were CPU-only, reference code/svd_classes_v2.py:16-18).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from svd_lstm_tpu.models.lstm import StackedLSTMParams, gate_update
from svd_lstm_tpu.ops.pallas_lstm import _gates_p  # shape-generic: (rows, 4*npg)
from svd_lstm_tpu.utils.linalg import LANE, ceil_to, pad_gate_cols

DEFAULT_BT = 512  # batch-tile rows per grid step


_ceil_to = ceil_to  # canonical helper lives in utils.linalg


def batched_lstm_recurrence_pallas(
    xp: jax.Array,  # (T, B, 4n) time-major hoisted projection incl. bias
    U: jax.Array,   # (n, 4n) f32
    bt: int = DEFAULT_BT,
    interpret: bool = False,
) -> jax.Array:
    """Batched dense h-side recurrence; returns h_seq (T, B, n) in xp.dtype.

    xp may be bf16 (recommended: halves the stream) or f32; U must be f32
    (it is VMEM-resident — its precision is free; the dot runs at bf16 MXU
    speed via ``precision=DEFAULT`` regardless).

    Grid is (batch_tiles, T) with time innermost: each batch tile's (h, c)
    state lives in f32 VMEM scratch across its whole time sweep and
    reinitializes to zero when the time index wraps.
    """
    T, B, g4 = xp.shape
    n = U.shape[0]
    assert g4 == 4 * n, (g4, n)
    npg = _ceil_to(n, LANE)
    BT = min(bt, _ceil_to(B, 8))
    Bp = _ceil_to(B, BT)
    dtype = xp.dtype

    if npg == n:  # already lane-aligned: avoid materializing identity copies
        U_p = U.astype(jnp.float32)
        xp_p = xp.reshape(T * B, g4)
    else:
        U_p = pad_gate_cols(U.astype(jnp.float32), n, npg)  # (n, 4npg) row-compact
        xp_p = pad_gate_cols(xp.reshape(T * B, g4), n, npg)
    if Bp != B:
        xp_p = xp_p.reshape(T, B, 4 * npg)
        pad = jnp.zeros((T, Bp - B, 4 * npg), dtype)
        xp_p = jnp.concatenate([xp_p, pad], axis=1).reshape(T * Bp, 4 * npg)

    nbt = Bp // BT

    def kernel(xp_ref, u_ref, out_ref, h_scr, c_scr):
        @pl.when(pl.program_id(1) == 0)
        def _():
            h_scr[:] = jnp.zeros_like(h_scr)
            c_scr[:] = jnp.zeros_like(c_scr)

        z = (
            jnp.dot(
                h_scr[:, :n],
                u_ref[:],
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            )
            + xp_ref[:].astype(jnp.float32)
        )
        h, c = _gates_p(z, c_scr[:], npg)
        h_scr[:] = h
        c_scr[:] = c
        out_ref[:] = h.astype(dtype)

    # flattened row layout: time-major blocks of Bp rows, batch tile i at
    # rows [t*Bp + i*BT, ... + BT)  ->  block row index t*nbt + i
    out = pl.pallas_call(
        kernel,
        grid=(nbt, T),
        in_specs=[
            pl.BlockSpec(
                (BT, 4 * npg), lambda i, t: (t * nbt + i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (BT, npg), lambda i, t: (t * nbt + i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((T * Bp, npg), dtype),
        scratch_shapes=[pltpu.VMEM((BT, npg), jnp.float32)] * 2,
        interpret=interpret,
    )(xp_p, U_p)
    return out.reshape(T, Bp, npg)[:, :B, :n]


@functools.partial(jax.jit, static_argnames=("interpret", "bt"))
def batched_forward_fast(
    params: StackedLSTMParams,
    x: jax.Array,  # (B, T, d) f32 or bf16
    bt: int = DEFAULT_BT,
    interpret: bool = False,
) -> jax.Array:
    """Whole-model batched forward in fast precision: bf16 x-side MXU
    matmuls + the VMEM-resident Pallas recurrence per layer. Returns
    (B, T, out) f32.

    This is the TPU implementation behind ``predict(..., precision="fast")``
    for batched input — measured 2.12 ms vs the XLA fast path's 3.32 ms at
    the 3x512/B=256/T=128 benchmark point (and ~7e-3 rel.err vs exact —
    better than all-bf16 because accumulation stays f32 in-kernel).
    """
    h = jnp.swapaxes(x, 0, 1).astype(jnp.bfloat16)  # (T, B, d)
    for layer in params.layers:
        W = layer.W.astype(jnp.bfloat16)
        b = layer.b.astype(jnp.bfloat16)
        xp = (
            jax.lax.dot_general(
                h,
                W,
                (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.bfloat16,
            )
            + b
        )  # (T, B, 4n) bf16
        n = layer.units
        if n % LANE == 0:
            h = batched_lstm_recurrence_pallas(
                xp, layer.U.astype(jnp.float32), bt=bt, interpret=interpret
            )  # (T, B, n) bf16
        else:
            # Narrow layers (n=30/40 reference scale): lane padding inflates
            # the xp stream ~3x and the K=n dot underfills the MXU — measured
            # 0.21x at 4x40/B=4096. The XLA bf16 scan stays optimal there.
            U16 = layer.U.astype(jnp.bfloat16)

            def step(carry, xp_t):
                hh, cc = carry
                z = xp_t + hh @ U16
                hh, cc = gate_update(z, cc)
                return (hh, cc), hh

            Bsz = xp.shape[1]
            h0 = jnp.zeros((Bsz, n), jnp.bfloat16)
            c0 = jnp.zeros((Bsz, n), jnp.bfloat16)
            _, h = jax.lax.scan(step, (h0, c0), xp)
    out = (
        h.astype(jnp.float32) @ params.head.w.astype(jnp.float32) + params.head.b
    )
    return jnp.swapaxes(out, 0, 1)
