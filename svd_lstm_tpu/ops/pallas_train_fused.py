"""Fused whole-stack trainable kernel for NARROW models (the reference's
own scale: every layer n <= 128).

At 4x40/B=512/T=200 the XLA train step is per-op-overhead-bound: each of
the ~1600 scan-step dots moves ~6 MFLOP — far below MXU amortization.
This module runs the ENTIRE stacked forward (all layers, inter-layer
projections included) in ONE Pallas kernel, and the entire backward in
one reverse-time kernel:

* every layer's W/U/b (and, in the backward, their transposes and the
  dW/dU/db accumulators) stay VMEM-resident for the whole sequence;
* per-layer state h/c packs one 128-lane block each, so the streamed
  residuals are two (B, L*128) blocks per step;
* the backward recomputes the gates from the streamed states (remat) and
  accumulates weight grads in VMEM scratch, written out once at the end.

Keeping both directions to a SINGLE kernel instance also sidesteps the
Mosaic crash mode bisected in scripts/probe_train_kernel.py (>=2 fwd
instances + a bwd instance + a differentiated matmul between them).

Gate layout is the P-layout of ops/pallas_lstm.py (each gate padded to a
128-lane block, weights row-compact); padded-lane garbage is annihilated
in the backward because the transposed padded weights have zero rows
there (tests assert gradient parity to ~1e-6).

All dots run at precision=DEFAULT — the matmul_precision="bfloat16"
training regime (exact-f32 training keeps the XLA scan).

Reference role: this replaces the reference's per-step Keras
``backend.rnn`` training loop (reference code/svd_classes_v3.py:408-419)
at its own model scale (4x40, 4x30, 3x15 — SURVEY.md §2.3 model zoo).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from svd_lstm_tpu.models.lstm import StackedLSTMParams, gate_update_bwd
from svd_lstm_tpu.ops.pallas_batched import LANE
from svd_lstm_tpu.ops.pallas_lstm import _gates_p
from svd_lstm_tpu.utils.linalg import pad_cols, pad_gate_cols

DEF = jax.lax.Precision.DEFAULT


def _pack_layers(layers) -> Tuple[list, list]:
    """Row-compact, gate-column-padded weights for every layer, plus the
    per-layer live input widths. Returns (weights, in_dims)."""
    ws = []
    in_dims = []
    for l in layers:
        n = l.units
        d_in = l.W.shape[0]
        in_dims.append(d_in)
        ws.append(pad_gate_cols(l.W.astype(jnp.float32), n, LANE))   # (d_in, 512)
        ws.append(pad_gate_cols(l.U.astype(jnp.float32), n, LANE))   # (n, 512)
        ws.append(pad_gate_cols(l.b.reshape(1, -1).astype(jnp.float32), n, LANE))
    return ws, in_dims


def _fused_fwd(layers, x, interpret: bool):
    """x: (T, B, d) f32. Returns (h_all, c_all): (T, B, L*128) f32 — the
    packed per-layer states (layer l's h in lanes [l*128, l*128+u_l))."""
    T, B, d = x.shape
    units = [l.units for l in layers]
    L = len(units)
    assert all(u <= LANE for u in units) and d <= LANE
    assert B % 8 == 0
    dp = LANE
    weights, _ = _pack_layers(layers)

    x_p = pad_cols(x.reshape(T * B, d).astype(jnp.float32), dp)

    def kernel(x_ref, *refs):
        w_refs = refs[: 3 * L]
        h_out, c_out = refs[3 * L], refs[3 * L + 1]
        scr = refs[3 * L + 2 :]  # per layer: h, c  (B, 128)

        @pl.when(pl.program_id(0) == 0)
        def _():
            for s in scr:
                s[:] = jnp.zeros_like(s)

        inp = x_ref[:, :d]
        for i in range(L):
            z = (
                jnp.dot(inp, w_refs[3 * i][:],
                        preferred_element_type=jnp.float32,
                        precision=DEF)
                + jnp.dot(scr[2 * i][:, : units[i]], w_refs[3 * i + 1][:],
                          preferred_element_type=jnp.float32,
                          precision=DEF)
                + w_refs[3 * i + 2][:]
            )
            h, c = _gates_p(z, scr[2 * i + 1][:], LANE)
            scr[2 * i][:] = h
            scr[2 * i + 1][:] = c
            h_out[:, i * LANE : (i + 1) * LANE] = h
            c_out[:, i * LANE : (i + 1) * LANE] = c
            inp = h[:, : units[i]]

    spec = pl.BlockSpec((B, L * LANE), lambda t: (t, 0), memory_space=pltpu.VMEM)
    h_all, c_all = pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=[pl.BlockSpec((B, dp), lambda t: (t, 0), memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(weights),
        out_specs=[spec, spec],
        out_shape=[jax.ShapeDtypeStruct((T * B, L * LANE), jnp.float32)] * 2,
        scratch_shapes=[pltpu.VMEM((B, LANE), jnp.float32)] * (2 * L),
        interpret=interpret,
    )(x_p, *weights)
    return h_all.reshape(T, B, L * LANE), c_all.reshape(T, B, L * LANE)


def _fused_bwd(layers, x, h_all, c_all, dh_last_seq, interpret: bool):
    """Reverse-time whole-stack backward.

    dh_last_seq: (T, B, 128) cotangent on the LAST layer's padded h
    sequence. Returns (dW list, dU list, db list, dx)."""
    T, B, d = x.shape
    units = [l.units for l in layers]
    L = len(units)
    dp = LANE
    weights, in_dims = _pack_layers(layers)
    # transposed weights, reusing the packed forms (their zero rows at
    # padded gate lanes kill the padded-lane garbage in dz)
    wts = []
    for i in range(L):
        wts.append(pad_cols(weights[3 * i].T, LANE))      # W^T: live cols [0, d_in)
        wts.append(pad_cols(weights[3 * i + 1].T, LANE))  # U^T: live cols [0, n)

    x_p = pad_cols(x.reshape(T * B, d).astype(jnp.float32), dp)
    dh_p = dh_last_seq.reshape(T * B, LANE).astype(jnp.float32)

    rev = lambda t: (T - 1 - t, 0)  # noqa: E731
    # h_prev/c_prev are the forward's own outputs read one block earlier
    # (no materialized shifted copies — at B=512 the two concatenates
    # cost ~1 ms of HBM copy traffic per step, round-5 decomposition);
    # the first reverse step (time 0) clamps to block 0 and the kernel
    # masks the value to zero
    prev = lambda t: (jnp.maximum(T - 2 - t, 0), 0)  # noqa: E731

    def kernel(x_ref, ha_ref, hp_ref, ca_ref, cp_ref, dhl_ref, *refs):
        w_refs = refs[: 3 * L]
        wt_refs = refs[3 * L : 5 * L]
        dx_ref = refs[5 * L]
        dw_out = refs[5 * L + 1 : 5 * L + 1 + 3 * L]
        scr = refs[5 * L + 1 + 3 * L :]
        # scr: per layer [dh, dc] (B,128), then per layer [dW, dU] (128,512)
        # and [db] (8,512) accumulators
        dh_scr = [scr[2 * i] for i in range(L)]
        dc_scr = [scr[2 * i + 1] for i in range(L)]
        acc = scr[2 * L :]

        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            for s in scr:
                s[:] = jnp.zeros_like(s)

        # processing time 0 (reverse grid's last step): h_prev = c_prev = 0
        # — the prev index map clamped to block 0, mask the stale values
        first = t == T - 1

        # top-down through the stack at this timestep
        dz_above = None  # dz of layer i+1 (feeds dh_i through its W)
        for i in range(L - 1, -1, -1):
            u = units[i]
            blk = slice(i * LANE, (i + 1) * LANE)
            hp_l = jnp.where(first, 0.0, hp_ref[:, blk][:, :u])
            cp_l = jnp.where(first, 0.0, cp_ref[:, blk])
            dh = dh_scr[i][:]
            if i == L - 1:
                dh = dh + dhl_ref[:]
            if dz_above is not None:
                # layer i+1's x-side: its input was h_i's live lanes
                dh = dh + jnp.dot(dz_above, wt_refs[2 * (i + 1)][:],
                                  preferred_element_type=jnp.float32,
                                  precision=DEF)
            inp = (
                x_ref[:, :d]
                if i == 0
                else ha_ref[:, (i - 1) * LANE : i * LANE][:, : units[i - 1]]
            )
            # recompute this layer's gates
            z = (
                jnp.dot(inp, w_refs[3 * i][:],
                        preferred_element_type=jnp.float32,
                        precision=DEF)
                + jnp.dot(hp_l, w_refs[3 * i + 1][:],
                          preferred_element_type=jnp.float32,
                          precision=DEF)
                + w_refs[3 * i + 2][:]
            )
            # shared cell-gradient formula (models.lstm.gate_update_bwd);
            # the gate stride here is the LANE-padded state block width
            dz, dc_new = gate_update_bwd(
                z, cp_l, ca_ref[:, blk], dh, dc_scr[i][:]
            )
            # weight-grad accumulation (VMEM-resident)
            acc[3 * i][: in_dims[i], :] += jnp.dot(
                inp.T, dz, preferred_element_type=jnp.float32,
                precision=DEF,
            )
            acc[3 * i + 1][:u, :] += jnp.dot(
                hp_l.T, dz,
                preferred_element_type=jnp.float32,
                precision=DEF,
            )
            acc[3 * i + 2][:] += jnp.broadcast_to(
                jnp.sum(dz, axis=0, keepdims=True), (8, 4 * LANE)
            )
            # carries
            dh_scr[i][:] = jnp.dot(dz, wt_refs[2 * i + 1][:],
                                   preferred_element_type=jnp.float32,
                                   precision=DEF)
            dc_scr[i][:] = dc_new
            dz_above = dz

        # dx from layer 0's dz
        dx_ref[:] = jnp.dot(dz_above, wt_refs[0][:],
                            preferred_element_type=jnp.float32,
                            precision=DEF)

        @pl.when(t == T - 1)
        def _():
            for k in range(3 * L):
                dw_out[k][:] = acc[k][:]

    sspec = pl.BlockSpec((B, L * LANE), rev, memory_space=pltpu.VMEM)
    out_shapes = [jax.ShapeDtypeStruct((T * B, dp), jnp.float32)]  # dx
    out_specs = [pl.BlockSpec((B, dp), rev, memory_space=pltpu.VMEM)]
    for i in range(L):
        out_shapes += [
            jax.ShapeDtypeStruct((LANE, 4 * LANE), jnp.float32),  # dW
            jax.ShapeDtypeStruct((LANE, 4 * LANE), jnp.float32),  # dU
            jax.ShapeDtypeStruct((8, 4 * LANE), jnp.float32),     # db
        ]
        out_specs += [
            pl.BlockSpec((LANE, 4 * LANE), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((LANE, 4 * LANE), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 4 * LANE), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ]

    scratch = [pltpu.VMEM((B, LANE), jnp.float32)] * (2 * L)
    for _ in range(L):
        scratch += [
            pltpu.VMEM((LANE, 4 * LANE), jnp.float32),
            pltpu.VMEM((LANE, 4 * LANE), jnp.float32),
            pltpu.VMEM((8, 4 * LANE), jnp.float32),
        ]

    outs = pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((B, dp), rev, memory_space=pltpu.VMEM),
            sspec,
            pl.BlockSpec((B, L * LANE), prev, memory_space=pltpu.VMEM),
            sspec,
            pl.BlockSpec((B, L * LANE), prev, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, LANE), rev, memory_space=pltpu.VMEM),
        ]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (5 * L),
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=scratch,
        interpret=interpret,
    )(
        x_p,
        h_all.reshape(T * B, L * LANE),
        h_all.reshape(T * B, L * LANE),
        c_all.reshape(T * B, L * LANE),
        c_all.reshape(T * B, L * LANE),
        dh_p,
        *weights,
        *wts,
    )
    dx_p = outs[0].reshape(T, B, dp)[:, :, :d]
    dWs, dUs, dbs = [], [], []
    for i, l in enumerate(layers):
        u = units[i]
        dW_p, dU_p, db_p = outs[1 + 3 * i : 4 + 3 * i]

        def unpad(m, rows, n=u):
            return jnp.concatenate(
                [m[:rows, g * LANE : g * LANE + n] for g in range(4)], axis=1
            )

        dWs.append(unpad(dW_p, in_dims[i]))
        dUs.append(unpad(dU_p, u))
        dbs.append(unpad(db_p, 1)[0])
    return dWs, dUs, dbs, dx_p


@functools.lru_cache(maxsize=None)
def _make_fused_trainable(interpret: bool):
    @jax.custom_vjp
    def rec(layers, x):
        # primal fallback (never the traced path under vjp): XLA scans
        from svd_lstm_tpu.ops.pallas_train import _fwd_scan_hc

        h = x
        for l in layers:
            xp = jnp.einsum(
                "tbd,dg->tbg", h, l.W,
                precision=DEF,
            ) + l.b
            h = _fwd_scan_hc(xp, l.U)[0]
        return pad_cols(h.reshape(-1, h.shape[-1]), LANE).reshape(
            x.shape[0], x.shape[1], LANE
        )

    def fwd(layers, x):
        h_all, c_all = _fused_fwd(layers, x, interpret)
        L = len(layers)
        h_last = h_all[:, :, (L - 1) * LANE :]
        return h_last, (layers, x, h_all, c_all)

    def bwd(res, dh_last_seq):
        layers, x, h_all, c_all = res
        dWs, dUs, dbs, dx = _fused_bwd(
            layers, x, h_all, c_all, dh_last_seq, interpret
        )
        from svd_lstm_tpu.models.lstm import LSTMLayerParams

        dlayers = tuple(
            LSTMLayerParams(W=dW, U=dU, b=db)
            for dW, dU, db in zip(dWs, dUs, dbs)
        )
        return dlayers, dx

    rec.defvjp(fwd, bwd)
    return rec


def fused_narrow_train_apply(
    params: StackedLSTMParams,
    x_seq: jax.Array,
    return_sequences: bool = True,
    interpret: bool = False,
) -> jax.Array:
    """Whole-stack trainable forward for narrow models (all units <= 128,
    input dim <= 128). x_seq: (B, T, d) -> (B, T, out) / (B, out)."""
    x = jnp.swapaxes(x_seq, 0, 1).astype(jnp.float32)  # (T, B, d)
    h_last_p = _make_fused_trainable(interpret)(tuple(params.layers), x)
    u_last = params.layers[-1].units
    h = h_last_p[:, :, :u_last]  # (T, B, n)
    if not return_sequences:
        h = h[-1]
        return h @ params.head.w + params.head.b
    out = h @ params.head.w + params.head.b
    return jnp.swapaxes(out, 0, 1)
