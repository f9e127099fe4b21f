"""Probe: weight-precision variants of the fused dense stack kernel at wide
model sizes (where BENCH_NOTES shows weight streaming dominates).

Variants (batch-1, whole-run T=6656, 3x512 model):
  A. f32 weights (current fused_dense_stack_pallas)
  B. bf16 weights + bf16 activation cast before each dot (f32 accumulate)
  C. int8 weights (per-gate-column scale) + dynamic int8 activation quant,
     int32 MXU dot, f32 scale epilogue: dot(x, W) ~= dot(qx, qW) * sx*sw

Prints device-time and max error vs the f32 XLA scan.
"""
import functools
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from svd_lstm_tpu.bench.devtime import device_time_ms
from svd_lstm_tpu.models.lstm import init_stacked_lstm, stacked_lstm_apply
from svd_lstm_tpu.ops.pallas_lstm import (
    LANE, DEFAULT_CT, _ceil_to, _gates_p, _dot, fused_dense_stack_pallas,
)
from svd_lstm_tpu.utils.linalg import pad_cols, pad_gate_cols

T = 6656
d = 16
UNITS = (512, 512, 512)

rng = np.random.default_rng(0)
params = init_stacked_lstm(jax.random.PRNGKey(0), d, UNITS)
x = jnp.asarray(rng.normal(size=(T, d)), jnp.float32)


def fused_stack_wdtype(params, x, wdtype, ct=DEFAULT_CT, interpret=False):
    """fused_dense_stack_pallas with weights stored/streamed as `wdtype`
    (activations cast to wdtype before each dot; f32 accumulate/state)."""
    T, d = x.shape
    units = [l.units for l in params.layers]
    L = len(units)
    npgs = [_ceil_to(n, LANE) for n in units]
    dp = _ceil_to(d, LANE)
    x_p = pad_cols(x, dp)
    weights = []
    for i, l in enumerate(params.layers):
        weights.append(pad_gate_cols(l.W.astype(wdtype), units[i], npgs[i]))
        weights.append(pad_gate_cols(l.U.astype(wdtype), units[i], npgs[i]))
        weights.append(pad_gate_cols(l.b.reshape(1, -1), units[i], npgs[i]))  # f32
    CT = min(ct, _ceil_to(T, 8))
    Tp = _ceil_to(T, CT)
    if Tp != T:
        x_p = jnp.concatenate([x_p, jnp.zeros((Tp - T, dp), x_p.dtype)], axis=0)

    def kernel(x_ref, *refs):
        w_refs = refs[: 3 * L]
        out_ref = refs[3 * L]
        scr = refs[3 * L + 1 :]

        @pl.when(pl.program_id(0) == 0)
        def _():
            for s in scr:
                s[:] = jnp.zeros_like(s)

        def body(t, _):
            inp = x_ref[pl.ds(t, 1), :d]
            for i in range(L):
                z = (
                    _dot(inp.astype(wdtype), w_refs[3 * i][:])
                    + _dot(scr[2 * i][:, : units[i]].astype(wdtype), w_refs[3 * i + 1][:])
                    + w_refs[3 * i + 2][:]
                )
                h, c = _gates_p(z, scr[2 * i + 1][:], npgs[i])
                scr[2 * i][:] = h
                scr[2 * i + 1][:] = c
                inp = h[:, : units[i]]
            out_ref[pl.ds(t, 1), :] = scr[2 * (L - 1)][:]
            return 0

        jax.lax.fori_loop(0, CT, body, 0)

    scratch = []
    for npg in npgs:
        scratch += [pltpu.VMEM((1, npg), jnp.float32)] * 2
    h_seq = pl.pallas_call(
        kernel,
        grid=(Tp // CT,),
        out_shape=jax.ShapeDtypeStruct((Tp, npgs[-1]), jnp.float32),
        in_specs=[pl.BlockSpec((CT, dp), lambda i: (i, 0), memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(weights),
        out_specs=pl.BlockSpec((CT, npgs[-1]), lambda i: (i, 0), memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
        interpret=interpret,
    )(x_p, *weights)
    return h_seq[:T, : units[-1]] @ params.head.w + params.head.b


def fused_stack_int8(params, x, ct=DEFAULT_CT, interpret=False):
    """int8 weights (per-column scale), dynamic per-step int8 activation
    quantization, int32 MXU dots, f32 epilogue."""
    T, d = x.shape
    units = [l.units for l in params.layers]
    L = len(units)
    npgs = [_ceil_to(n, LANE) for n in units]
    dp = _ceil_to(d, LANE)
    x_p = pad_cols(x, dp)
    from svd_lstm_tpu.utils.quantize import quantize_tensor

    weights = []
    for i, l in enumerate(params.layers):
        for M in (l.W, l.U):
            t = quantize_tensor(M)
            weights.append(pad_gate_cols(t.q, units[i], npgs[i]))
            weights.append(pad_gate_cols(t.scale, units[i], npgs[i]))
        weights.append(pad_gate_cols(l.b.reshape(1, -1), units[i], npgs[i]))
    CT = min(ct, _ceil_to(T, 8))
    Tp = _ceil_to(T, CT)
    if Tp != T:
        x_p = jnp.concatenate([x_p, jnp.zeros((Tp - T, dp), x_p.dtype)], axis=0)

    def qdot(v, q_ref, s_ref, live):
        """v: (1, live) f32 -> (1, 4npg) f32 via int8 dynamic quant."""
        sv = jnp.max(jnp.abs(v)) / 127.0
        sv = jnp.where(sv > 0, sv, 1.0)
        qv = jnp.clip(jnp.round(v / sv), -127, 127).astype(jnp.int8)
        zi = jnp.dot(qv, q_ref[:], preferred_element_type=jnp.int32)
        return zi.astype(jnp.float32) * (s_ref[:] * sv)

    def kernel(x_ref, *refs):
        w_refs = refs[: 5 * L]
        out_ref = refs[5 * L]
        scr = refs[5 * L + 1 :]

        @pl.when(pl.program_id(0) == 0)
        def _():
            for s in scr:
                s[:] = jnp.zeros_like(s)

        def body(t, _):
            inp = x_ref[pl.ds(t, 1), :d]
            for i in range(L):
                z = (
                    qdot(inp, w_refs[5 * i], w_refs[5 * i + 1], inp.shape[1])
                    + qdot(scr[2 * i][:, : units[i]], w_refs[5 * i + 2], w_refs[5 * i + 3], units[i])
                    + w_refs[5 * i + 4][:]
                )
                h, c = _gates_p(z, scr[2 * i + 1][:], npgs[i])
                scr[2 * i][:] = h
                scr[2 * i + 1][:] = c
                inp = h[:, : units[i]]
            out_ref[pl.ds(t, 1), :] = scr[2 * (L - 1)][:]
            return 0

        jax.lax.fori_loop(0, CT, body, 0)

    scratch = []
    for npg in npgs:
        scratch += [pltpu.VMEM((1, npg), jnp.float32)] * 2
    h_seq = pl.pallas_call(
        kernel,
        grid=(Tp // CT,),
        out_shape=jax.ShapeDtypeStruct((Tp, npgs[-1]), jnp.float32),
        in_specs=[pl.BlockSpec((CT, dp), lambda i: (i, 0), memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(weights),
        out_specs=pl.BlockSpec((CT, npgs[-1]), lambda i: (i, 0), memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
        interpret=interpret,
    )(x_p, *weights)
    return h_seq[:T, : units[-1]] @ params.head.w + params.head.b


def main():
    print("devices:", jax.devices())
    ref = jax.jit(lambda p, xx: stacked_lstm_apply(p, xx[None], return_sequences=True)[0])(
        params, x
    )
    ref = np.asarray(ref)
    sig = np.abs(ref).max()

    fns = {
        "A f32 fused": jax.jit(fused_dense_stack_pallas),
        "B bf16 fused": jax.jit(functools.partial(fused_stack_wdtype, wdtype=jnp.bfloat16)),
        "C int8 fused": jax.jit(fused_stack_int8),
    }
    for name, fn in fns.items():
        try:
            y = np.asarray(fn(params, x))
            err = np.abs(y - ref).max() / sig
            ms = device_time_ms(fn, params, x, repeats=3)
            print(f"{name:16s} {ms:8.3f} ms  ({ms*1e3/T:6.3f} us/step)  rel.err {err:.2e}")
        except Exception as e:
            print(f"{name:16s} FAILED: {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
