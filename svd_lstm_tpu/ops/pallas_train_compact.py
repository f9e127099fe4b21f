"""Compact-layout (C-layout) fused whole-stack TRAIN kernels for narrow
models — k gates per 128-lane block instead of the P-layout's one.

Why: the P-layout train kernels (ops/pallas_train_fused.py) pad every
gate of an n<=128 layer to its own 128-lane block, so at n=40 the MXU
does 512-lane dots for 160 live lanes (train MFU 0.03, BENCH_NOTES
round-4 training floor). The inference kernels measured compact 0.8x at
batch-1 (the per-step chain is latency-bound and the extra rolls cost
more than the bytes saved — BENCH_NOTES round-2), but batched TRAINING
is compute-bound: packing k=2 gates per block at n=40 halves both the
padded MACs and the VPU transcendental lanes.

Layout (utils.linalg.pack_gate_cols_compact, block order [i|g],[f|o] for
k=2; [i|g|f|o] in one block for k=4): weights are gate-packed AND
row-padded to 128 (the pad rows are zero, so full 128-lane operands
contract exactly — no unaligned lane slices anywhere, and the h-state's
garbage lanes >= n annihilate against the zero rows). Gate extraction
uses static intra-block rolls exactly like ops/pallas_lstm._gates_compact.

Backward exactness on pad lanes: the incoming dh/dc carries are zero on
lanes >= n (the dz @ U^T contraction output vanishes there because U's
pad rows are zero), so every gate derivative is zero on pad lanes BEFORE
the dz blocks are packed — the roll-and-add packing cannot corrupt live
lanes. dW/dU accumulate garbage only in rows/columns that the unpacking
slice discards.

Gradient parity with autodiff of the scan is asserted in
tests/test_pallas_train_compact.py; compiled==interpret in the tpu suite.

Reference role: same as ops/pallas_train_fused.py — the training path
for the reference's own model zoo (4x40, 4x30, 3x15; reference
code/svd_classes_v3.py:408-419 trains via Keras backend.rnn).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from svd_lstm_tpu.models.lstm import StackedLSTMParams
from svd_lstm_tpu.ops.pallas_batched import LANE
from svd_lstm_tpu.utils.linalg import gate_group_size, pack_gate_cols_compact, pad_cols

F32 = jnp.float32
DEF = jax.lax.Precision.DEFAULT

# (B, G*128) x (rows, G*128) -> (B, rows): "@ rhs^T"
_T_RHS = (((1,), (1,)), ((), ()))
# (B, rows) x (B, G*128) -> (rows, G*128): "lhs^T @"
_T_LHS = (((0,), (0,)), ((), ()))


def compact_eligible(params: StackedLSTMParams, d_in: int) -> bool:
    """Every layer packs >= 2 gates per block and inputs fit one block."""
    return (
        all(gate_group_size(l.units) >= 2 for l in params.layers)
        and d_in <= LANE
        and all(l.units <= LANE for l in params.layers)
    )


def _roll(v: jax.Array, shift: int, interpret: bool) -> jax.Array:
    if interpret:
        return jnp.roll(v, shift, axis=1)
    return pltpu.roll(v, shift=shift % LANE, axis=1)


def _parts(z, n: int, k: int, interpret: bool):
    """Gates (i, f, g, o), each (B, 128) aligned to lane 0 — the SAME
    extraction arithmetic as ops/pallas_lstm._gates_compact (kept batched
    and parts-returning here because the backward needs the raw gates)."""
    if k == 4:
        zb = z[:, :LANE]
        s = jax.nn.sigmoid(zb)
        i = s
        g = _roll(jnp.tanh(zb), -n, interpret)
        f = _roll(s, -2 * n, interpret)
        o = _roll(s, -3 * n, interpret)
    else:  # k == 2: block 0 = [i|g], block 1 = [f|o]
        i = jax.nn.sigmoid(z[:, :LANE])
        g = _roll(jnp.tanh(z[:, :LANE]), -n, interpret)
        f = jax.nn.sigmoid(z[:, LANE : 2 * LANE])
        o = _roll(f, -n, interpret)
    return i, f, g, o


def _gates_fwd(z, c, n: int, k: int, interpret: bool):
    i, f, g, o = _parts(z, n, k, interpret)
    c_new = f * c + i * g
    return o * jnp.tanh(c_new), c_new


def _pack_dz(di, df, dg, do, n: int, k: int, interpret: bool):
    """Inverse of the _parts extraction: derivative blocks back into the
    compact z layout. di/df/dg/do are zero on lanes >= n (see module
    docstring), so the roll-and-add packing is exact."""
    if k == 4:
        return (
            di
            + _roll(dg, n, interpret)
            + _roll(df, 2 * n, interpret)
            + _roll(do, 3 * n, interpret)
        )
    dz0 = di + _roll(dg, n, interpret)
    dz1 = df + _roll(do, n, interpret)
    return jnp.concatenate([dz0, dz1], axis=1)


def _gates_bwd(z, cp, ct, dh, dc, n: int, k: int, interpret: bool):
    """(dz_compact, dc_prev) from the recomputed compact pre-activations.
    Same cell-gradient formula as models.lstm.gate_update_bwd, applied to
    the roll-aligned gate parts."""
    i, f, g, o = _parts(z, n, k, interpret)
    tc = jnp.tanh(ct)
    dc_tot = dc + dh * o * (1.0 - tc * tc)
    di = dc_tot * g * i * (1.0 - i)
    df = dc_tot * cp * f * (1.0 - f)
    dg = dc_tot * i * (1.0 - g * g)
    do = dh * tc * o * (1.0 - o)
    return _pack_dz(di, df, dg, do, n, k, interpret), dc_tot * f


def _pack_layers(layers):
    """Compact, row-padded-to-128 weights per layer + static dims.
    Returns (weights[3L], in_dims, ks, Gs)."""
    ws, in_dims, ks, gs = [], [], [], []
    for l in layers:
        n = l.units
        k = gate_group_size(n)
        assert k >= 2
        d_in = l.W.shape[0]
        in_dims.append(d_in)
        ks.append(k)
        gs.append(4 // k)
        Wc = pack_gate_cols_compact(l.W.astype(F32), n, k)
        Uc = pack_gate_cols_compact(l.U.astype(F32), n, k)
        bc = pack_gate_cols_compact(l.b.reshape(1, -1).astype(F32), n, k)
        # zero row-padding to a full 128-lane contraction: pad rows kill
        # the operand's garbage lanes, so kernels never lane-slice
        ws.append(jnp.zeros((LANE, Wc.shape[1]), F32).at[:d_in].set(Wc))
        ws.append(jnp.zeros((LANE, Uc.shape[1]), F32).at[:n].set(Uc))
        ws.append(bc)
    return ws, in_dims, ks, gs


def _fused_fwd(layers, x, interpret: bool):
    """x: (T, B, d). Returns (h_all, c_all): (T, B, L*128) packed states."""
    T, B, d = x.shape
    units = [l.units for l in layers]
    L = len(units)
    assert B % 8 == 0
    weights, _, ks, _ = _pack_layers(layers)
    x_p = pad_cols(x.reshape(T * B, d).astype(F32), LANE)

    def kernel(x_ref, *refs):
        w_refs = refs[: 3 * L]
        h_out, c_out = refs[3 * L], refs[3 * L + 1]
        scr = refs[3 * L + 2 :]

        @pl.when(pl.program_id(0) == 0)
        def _():
            for s in scr:
                s[:] = jnp.zeros_like(s)

        inp = x_ref[:]  # (B, 128); pad lanes zero / annihilated by pad rows
        for i in range(L):
            z = (
                jnp.dot(inp, w_refs[3 * i][:], precision=DEF,
                        preferred_element_type=F32)
                + jnp.dot(scr[2 * i][:], w_refs[3 * i + 1][:], precision=DEF,
                          preferred_element_type=F32)
                + w_refs[3 * i + 2][:]
            )
            h, c = _gates_fwd(z, scr[2 * i + 1][:], units[i], ks[i], interpret)
            scr[2 * i][:] = h
            scr[2 * i + 1][:] = c
            h_out[:, i * LANE : (i + 1) * LANE] = h
            c_out[:, i * LANE : (i + 1) * LANE] = c
            inp = h

    spec = pl.BlockSpec((B, L * LANE), lambda t: (t, 0), memory_space=pltpu.VMEM)
    h_all, c_all = pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=[pl.BlockSpec((B, LANE), lambda t: (t, 0),
                               memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(weights),
        out_specs=[spec, spec],
        out_shape=[jax.ShapeDtypeStruct((T * B, L * LANE), F32)] * 2,
        scratch_shapes=[pltpu.VMEM((B, LANE), F32)] * (2 * L),
        interpret=interpret,
    )(x_p, *weights)
    return h_all.reshape(T, B, L * LANE), c_all.reshape(T, B, L * LANE)


def _fused_bwd(layers, x, h_all, c_all, dh_last_seq, interpret: bool):
    """Reverse-time whole-stack backward in the compact layout. Returns
    (dW list, dU list, db list, dx) in keras layout."""
    T, B, d = x.shape
    units = [l.units for l in layers]
    L = len(units)
    weights, in_dims, ks, gs = _pack_layers(layers)

    x_p = pad_cols(x.reshape(T * B, d).astype(F32), LANE)
    dh_p = dh_last_seq.reshape(T * B, LANE).astype(F32)

    rev = lambda t: (T - 1 - t, 0)  # noqa: E731
    # prev-state blocks read from the forward's own outputs one block
    # earlier (no materialized shifted copies — the concatenates cost
    # full-tensor HBM copies per step, round-5 decomposition); the first
    # reverse step clamps to block 0 and the kernel masks to zero
    prev = lambda t: (jnp.maximum(T - 2 - t, 0), 0)  # noqa: E731

    def kernel(x_ref, ha_ref, hp_ref, ca_ref, cp_ref, dhl_ref, *refs):
        w_refs = refs[: 3 * L]
        dx_ref = refs[3 * L]
        dw_out = refs[3 * L + 1 : 3 * L + 1 + 3 * L]
        scr = refs[3 * L + 1 + 3 * L :]
        dh_scr = [scr[2 * i] for i in range(L)]
        dc_scr = [scr[2 * i + 1] for i in range(L)]
        acc = scr[2 * L :]

        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            for s in scr:
                s[:] = jnp.zeros_like(s)

        first = t == T - 1  # processing time 0: h_prev = c_prev = 0
        dz_above = None
        i_above = None
        for i in range(L - 1, -1, -1):
            u = units[i]
            blk = slice(i * LANE, (i + 1) * LANE)
            hp_l = jnp.where(first, 0.0, hp_ref[:, blk])
            cp_l = jnp.where(first, 0.0, cp_ref[:, blk])
            dh = dh_scr[i][:]
            if i == L - 1:
                dh = dh + dhl_ref[:]
            if dz_above is not None:
                # layer i+1's x-side fed from h_i: dz_{i+1} @ W_{i+1}^T
                dh = dh + jax.lax.dot_general(
                    dz_above, w_refs[3 * i_above][:], _T_RHS, precision=DEF,
                    preferred_element_type=F32,
                )
            inp = x_ref[:] if i == 0 else ha_ref[:, (i - 1) * LANE : i * LANE]
            z = (
                jnp.dot(inp, w_refs[3 * i][:], precision=DEF,
                        preferred_element_type=F32)
                + jnp.dot(hp_l, w_refs[3 * i + 1][:], precision=DEF,
                          preferred_element_type=F32)
                + w_refs[3 * i + 2][:]
            )
            dz, dc_new = _gates_bwd(
                z, cp_l, ca_ref[:, blk], dh, dc_scr[i][:],
                u, ks[i], interpret,
            )
            acc[3 * i][:] += jax.lax.dot_general(
                inp, dz, _T_LHS, precision=DEF, preferred_element_type=F32
            )
            acc[3 * i + 1][:] += jax.lax.dot_general(
                hp_l, dz, _T_LHS, precision=DEF,
                preferred_element_type=F32,
            )
            acc[3 * i + 2][:] += jnp.broadcast_to(
                jnp.sum(dz, axis=0, keepdims=True), (8, gs[i] * LANE)
            )
            dh_scr[i][:] = jax.lax.dot_general(
                dz, w_refs[3 * i + 1][:], _T_RHS, precision=DEF,
                preferred_element_type=F32,
            )
            dc_scr[i][:] = dc_new
            dz_above = dz
            i_above = i

        dx_ref[:] = jax.lax.dot_general(
            dz_above, w_refs[0][:], _T_RHS, precision=DEF,
            preferred_element_type=F32,
        )

        @pl.when(t == T - 1)
        def _():
            for j in range(3 * L):
                dw_out[j][:] = acc[j][:]

    sspec = pl.BlockSpec((B, L * LANE), rev, memory_space=pltpu.VMEM)
    out_shapes = [jax.ShapeDtypeStruct((T * B, LANE), F32)]
    out_specs = [pl.BlockSpec((B, LANE), rev, memory_space=pltpu.VMEM)]
    scratch = [pltpu.VMEM((B, LANE), F32)] * (2 * L)
    for i in range(L):
        zw = gs[i] * LANE
        out_shapes += [
            jax.ShapeDtypeStruct((LANE, zw), F32),  # dW (compact, padded rows)
            jax.ShapeDtypeStruct((LANE, zw), F32),  # dU
            jax.ShapeDtypeStruct((8, zw), F32),     # db
        ]
        out_specs += [
            pl.BlockSpec((LANE, zw), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((LANE, zw), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, zw), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ]
        scratch += [
            pltpu.VMEM((LANE, zw), F32),
            pltpu.VMEM((LANE, zw), F32),
            pltpu.VMEM((8, zw), F32),
        ]

    outs = pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((B, LANE), rev, memory_space=pltpu.VMEM),
            sspec,
            pl.BlockSpec((B, L * LANE), prev, memory_space=pltpu.VMEM),
            sspec,
            pl.BlockSpec((B, L * LANE), prev, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, LANE), rev, memory_space=pltpu.VMEM),
        ]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (3 * L),
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
    )
    dx_p = outs[0].reshape(T, B, LANE)[:, :, :d]
    dWs, dUs, dbs = [], [], []
    for i, l in enumerate(layers):
        u = units[i]
        k = ks[i]
        dW_c, dU_c, db_c = outs[1 + 3 * i : 4 + 3 * i]

        def unpack(m, rows, n=u, k=k):
            # inverse of pack_gate_cols_compact: keras order [i|f|g|o]
            order = (0, 2, 1, 3)
            cols = [None] * 4
            for slot, gate in enumerate(order):
                b_, off = divmod(slot, k)
                cols[gate] = m[:rows, b_ * LANE + off * n : b_ * LANE + off * n + n]
            return jnp.concatenate(cols, axis=1)

        dWs.append(unpack(dW_c, in_dims[i]))
        dUs.append(unpack(dU_c, u))
        dbs.append(unpack(db_c, 1)[0])
    return dWs, dUs, dbs, dx_p


@functools.lru_cache(maxsize=None)
def _make_compact_trainable(interpret: bool):
    @jax.custom_vjp
    def rec(layers, x):
        return _fused_fwd(layers, x, interpret)[0][
            :, :, (len(layers) - 1) * LANE :
        ]

    def fwd(layers, x):
        h_all, c_all = _fused_fwd(layers, x, interpret)
        L = len(layers)
        return h_all[:, :, (L - 1) * LANE :], (layers, x, h_all, c_all)

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


def fused_narrow_train_apply_compact(
    params: StackedLSTMParams,
    x_seq: jax.Array,
    return_sequences: bool = True,
    interpret: bool = False,
) -> jax.Array:
    """Whole-stack trainable forward in the compact gate layout (every
    layer gate_group_size >= 2, input dim <= 128). x_seq: (B, T, d)."""
    x = jnp.swapaxes(x_seq, 0, 1).astype(F32)  # (T, B, d)
    h_last_p = _make_compact_trainable(interpret)(tuple(params.layers), x)
    u_last = params.layers[-1].units
    h = h_last_p[:, :, :u_last]
    if not return_sequences:
        h = h[-1]
        return h @ params.head.w + params.head.b
    out = h @ params.head.w + params.head.b
    return jnp.swapaxes(out, 0, 1)
