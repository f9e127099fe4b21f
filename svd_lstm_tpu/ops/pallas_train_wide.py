"""Fully-fused wide-layer trainable LSTM kernel (one layer, n % 128 == 0).

The round-3 wide train path (ops/pallas_train.py uniform branch) keeps the
recurrence in Pallas but leaves the x-projection and its VJP to XLA. The
round-3 decomposition probe (scripts/probe_train_floor.py) shows that at
3x512/B=128/T=200 the Pallas fwd+bwd pairs account for only ~4.6 ms of the
13.1 ms step — the rest is XLA-side traffic: every layer materialises
``xp``/``dz`` as (T, B, 4n) HBM arrays (210 MB each at this shape), reads
them back for ``dW = h^T dz`` / ``dh = dz W^T``, and copies two more
(T, B, n) arrays for the ``h_prev``/``c_prev`` concats.

This module eliminates ALL (T, B, 4n) HBM arrays and the shift copies:

* **forward** — W, U, b resident in VMEM; per step ``z = x_t@W + h@U + b``
  computed in-kernel; streams x (n wide) in, h/c (n wide) out.
* **backward** — W, U resident; recomputes z from ``(x_t, h_prev)``
  (standard remat, two dots); ``dx = dz@W^T`` / ``dh_prev = dz@U^T`` and
  the dW/dU accumulations run as transposed-contraction ``dot_general``
  on the SAME resident weights (measured FASTER than explicit per-step
  dz block transposes: 11.8 vs 14.3 ms full step — Mosaic feeds the MXU
  transposed operands natively); dW/dU/db accumulate in f32 VMEM scratch
  across the whole (batch-tile, time) grid, written out once.
  ``h_prev`` / ``c_prev`` are read from the forward's own outputs through
  a shifted block index map (``max(T-2-t, 0)``, first-step value masked
  to zero) — no concat copies. The residents + accumulators need ~26 MB
  of scoped VMEM at n=512 (above the 16 MB compiler DEFAULT, inside the
  hardware) — raised via ``CompilerParams(vmem_limit_bytes=...)``.

All dots run on f32 VMEM operands at ``precision=DEFAULT`` (single-pass
bf16 multiply, f32 accumulate) — the same numerics contract as every
round-3 kernel. Storing the weights bf16 would halve the resident
footprint, but this Mosaic toolchain crashes on bf16-operand kernels of
this shape family (measured: the f32-DEF variant of the same kernel
compiles, the bf16 one 500s the remote compiler —
scripts/probe_mosaic_bf16_dots.py and the probe log in BENCH_NOTES).

VMEM at n=512, BWD_BT=64: residents W+U+dW+dU f32 = 16 MB + b + 6
streamed (64, 512) blocks double-buffered ~1.6 MB + (64, 2048) z/dz
temporaries — near the ~16 MB/core budget; the smaller backward tile
(same pattern as pallas_train.DEFAULT_BWD_BT) keeps the block share
small. If the toolchain rejects the residency, the uniform-stack
dispatch falls back to the round-3 split path.

Reference role: same as ops/pallas_train.py — the TPU replacement for the
reference's Keras ``backend.rnn`` training loop
(reference code/svd_classes_v3.py:408-419) at wide model widths.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from svd_lstm_tpu.models.lstm import gate_update, gate_update_bwd
from svd_lstm_tpu.ops.pallas_batched import DEFAULT_BT, _ceil_to

F32 = jnp.float32
DEF = jax.lax.Precision.DEFAULT

# dot_general contractions: (B, 4n) x (n, 4n) -> (B, n)  ("@ rhs^T")
_T_RHS = (((1,), (1,)), ((), ()))
# (B, n) x (B, 4n) -> (n, 4n)  ("lhs^T @")
_T_LHS = (((0,), (0,)), ((), ()))

# backward batch tile: 128 measured best at n=512/B=128 (9.90 ms full
# step vs 11.79 at BT=64 — one reverse sweep instead of two; the raised
# vmem_limit_bytes makes the residency fit; scripts/probe_wide_bt_bwd.py)
DEFAULT_WIDE_BWD_BT = 128

def _pad_rows(a: jax.Array, T: int, B: int, Bp: int) -> jax.Array:
    """(T, B, w) -> (T*Bp, w) with zero rows appended per timestep."""
    if Bp != B:
        pad = jnp.zeros((T, Bp - B) + a.shape[2:], a.dtype)
        a = jnp.concatenate([a, pad], axis=1)
    return a.reshape(T * Bp, -1)


def _wide_fwd(x, W, U, b, bt: int, interpret: bool):
    """x: (T, B, n) f32. Returns (h_seq, c_seq): (T, B, n) f32."""
    T, B, n = x.shape
    g4 = 4 * n
    assert W.shape == (n, g4) and U.shape == (n, g4)
    BT = min(bt, _ceil_to(B, 8))
    Bp = _ceil_to(B, BT)
    nbt = Bp // BT
    x_p = _pad_rows(x.astype(F32), T, B, Bp)

    def kernel(x_ref, w_ref, u_ref, b_ref, h_out, c_out, h_scr, c_scr):
        @pl.when(pl.program_id(1) == 0)
        def _():
            h_scr[:] = jnp.zeros_like(h_scr)
            c_scr[:] = jnp.zeros_like(c_scr)

        z = (
            jnp.dot(x_ref[:], w_ref[:], precision=DEF,
                    preferred_element_type=F32)
            + jnp.dot(h_scr[:], u_ref[:], precision=DEF,
                      preferred_element_type=F32)
            + b_ref[:]
        )
        h, c = gate_update(z, c_scr[:])
        h_scr[:] = h
        c_scr[:] = c
        h_out[:] = h
        c_out[:] = c

    spec = pl.BlockSpec((BT, n), lambda i, t: (t * nbt + i, 0),
                        memory_space=pltpu.VMEM)
    h2, c2 = pl.pallas_call(
        kernel,
        grid=(nbt, T),
        in_specs=[
            spec,
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[spec, spec],
        out_shape=[jax.ShapeDtypeStruct((T * Bp, n), F32)] * 2,
        scratch_shapes=[pltpu.VMEM((BT, n), F32)] * 2,
        interpret=interpret,
    )(x_p, W.astype(F32), U.astype(F32), b.reshape(1, g4).astype(F32))
    return h2.reshape(T, Bp, n)[:, :B], c2.reshape(T, Bp, n)[:, :B]


def _wide_bwd(x, W, U, b, h_seq, c_seq, dh_seq, bt: int, interpret: bool):
    """Reverse-time fused backward. Returns (dx, dW, dU, db)."""
    T, B, n = x.shape
    g4 = 4 * n
    BT = min(bt, _ceil_to(B, 8))
    Bp = _ceil_to(B, BT)
    nbt = Bp // BT

    rev = lambda i, t: ((T - 1 - t) * nbt + i, 0)  # noqa: E731
    # previous-step state: block (t-1) of the SAME array; at the last grid
    # step (time 0) the index clamps to 0 and the kernel masks the value
    prev = lambda i, t: (  # noqa: E731
        jnp.maximum(T - 2 - t, 0) * nbt + i, 0
    )

    def kernel(x_ref, hp_ref, cp_ref, ct_ref, dh_ref, w_ref, u_ref, b_ref,
               dx_ref, dw_ref, du_ref, db_ref,
               dh_scr, dc_scr, dw_scr, du_scr, db_scr):
        i_tile = pl.program_id(0)
        t = pl.program_id(1)

        @pl.when(t == 0)  # each batch tile's reverse sweep starts clean
        def _():
            dh_scr[:] = jnp.zeros_like(dh_scr)
            dc_scr[:] = jnp.zeros_like(dc_scr)

        @pl.when((i_tile == 0) & (t == 0))  # dW/dU accumulate across tiles
        def _():
            dw_scr[:] = jnp.zeros_like(dw_scr)
            du_scr[:] = jnp.zeros_like(du_scr)
            db_scr[:] = jnp.zeros_like(db_scr)

        first_step = t == T - 1  # processing time 0: h_prev = c_prev = 0
        hp = jnp.where(first_step, 0.0, hp_ref[:])
        cp = jnp.where(first_step, 0.0, cp_ref[:])

        dh = dh_ref[:] + dh_scr[:]
        z = (
            jnp.dot(x_ref[:], w_ref[:], precision=DEF,
                    preferred_element_type=F32)
            + jnp.dot(hp, u_ref[:], precision=DEF,
                      preferred_element_type=F32)
            + b_ref[:]
        )
        dz, dc_new = gate_update_bwd(z, cp, ct_ref[:], dh, dc_scr[:])
        # Transposed-contraction dot_general on the resident weights —
        # measured FASTER than explicit per-step block transposes of dz
        # (11.8 vs 14.3 ms full step at 3x512/B=128: Mosaic feeds the MXU
        # transposed operands natively; scripts/probe_train_wide_fused.py)
        dh_scr[:] = jax.lax.dot_general(dz, u_ref[:], _T_RHS, precision=DEF,
                                        preferred_element_type=F32)
        dc_scr[:] = dc_new
        dx_ref[:] = jax.lax.dot_general(dz, w_ref[:], _T_RHS, precision=DEF,
                                        preferred_element_type=F32)
        dw_scr[:] += jax.lax.dot_general(x_ref[:], dz, _T_LHS, precision=DEF,
                                         preferred_element_type=F32)
        du_scr[:] += jax.lax.dot_general(hp, dz, _T_LHS, precision=DEF,
                                         preferred_element_type=F32)
        db_scr[:] += jnp.broadcast_to(
            jnp.sum(dz, axis=0, keepdims=True), (8, g4)
        )

        @pl.when((i_tile == nbt - 1) & (t == T - 1))
        def _():
            dw_ref[:] = dw_scr[:]
            du_ref[:] = du_scr[:]
            db_ref[:] = db_scr[:]

    bspec = lambda idx: pl.BlockSpec((BT, n), idx, memory_space=pltpu.VMEM)  # noqa: E731
    wspec = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i, t: (0, 0), memory_space=pltpu.VMEM
    )
    dx, dW, dU, db8 = pl.pallas_call(
        kernel,
        grid=(nbt, T),
        in_specs=[
            bspec(rev),    # x_t
            bspec(prev),   # h_prev
            bspec(prev),   # c_prev
            bspec(rev),    # c_t
            bspec(rev),    # dh_t
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[bspec(rev), wspec((n, g4)), wspec((n, g4)), wspec((8, g4))],
        out_shape=[
            jax.ShapeDtypeStruct((T * Bp, n), F32),
            jax.ShapeDtypeStruct((n, g4), F32),
            jax.ShapeDtypeStruct((n, g4), F32),
            jax.ShapeDtypeStruct((8, g4), F32),
        ],
        scratch_shapes=[
            pltpu.VMEM((BT, n), F32),
            pltpu.VMEM((BT, n), F32),
            pltpu.VMEM((n, g4), F32),
            pltpu.VMEM((n, g4), F32),
            pltpu.VMEM((8, g4), F32),
        ],
        # W+U residents + dW^T/dU^T accumulators are 16 MB f32 at n=512;
        # with the per-step dz/dzT temporaries the kernel needs ~26 MB of
        # scoped VMEM — above the 16 MB DEFAULT limit but well inside the
        # hardware (measured: compiles and runs with the raised limit)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(
        _pad_rows(x.astype(F32), T, B, Bp),
        _pad_rows(h_seq, T, B, Bp),
        _pad_rows(c_seq, T, B, Bp),
        _pad_rows(c_seq, T, B, Bp),
        _pad_rows(dh_seq.astype(F32), T, B, Bp),
        W.astype(F32),
        U.astype(F32),
        b.reshape(1, g4).astype(F32),
    )
    return (
        dx.reshape(T, Bp, n)[:, :B],
        dW,
        dU,
        db8[0],
    )


@functools.lru_cache(maxsize=None)
def _make_wide_trainable(bt: int, bt_bwd: int, interpret: bool):
    @jax.custom_vjp
    def rec(x, W, U, b):
        return _wide_fwd(x, W, U, b, bt, interpret)[0]

    def fwd(x, W, U, b):
        h_seq, c_seq = _wide_fwd(x, W, U, b, bt, interpret)
        return h_seq, (x, W, U, b, h_seq, c_seq)

    def bwd(res, dh_seq):
        return _wide_bwd(*res, dh_seq, bt_bwd, interpret)

    rec.defvjp(fwd, bwd)
    return rec


def wide_layer_trainable(
    x: jax.Array,
    W: jax.Array,
    U: jax.Array,
    b: jax.Array,
    bt: int = DEFAULT_BT,
    bt_bwd: int = DEFAULT_WIDE_BWD_BT,
    interpret: bool = False,
) -> jax.Array:
    """Differentiable fully-fused LSTM layer: x (T, B, n) time-major input
    (zero-pad the first layer's input to n columns and its W rows to n —
    the pads are gradient-exact), W (n, 4n), U (n, 4n), b (4n,).
    Returns h_seq (T, B, n) f32; gradients flow to all four inputs."""
    return _make_wide_trainable(bt, bt_bwd, interpret)(x, W, U, b)
