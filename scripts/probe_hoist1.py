"""Probe: hoist layer-1's input projection out of the fused dense stack
kernel (one big MXU matmul outside; the kernel consumes xp1 directly and
skips layer-1's in-kernel W dot — 1 of 2L dependent dots per step)."""
import functools
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from svd_lstm_tpu.bench.devtime import device_time_ms
from svd_lstm_tpu.models.lstm import init_stacked_lstm, stacked_lstm_apply
from svd_lstm_tpu.ops.pallas_lstm import (
    LANE, DEFAULT_CT, DEFAULT_UNROLL, _ceil_to, _gates_p, _dot, _time_loop,
    fused_dense_stack_pallas,
)
from svd_lstm_tpu.utils.linalg import pad_cols, pad_gate_cols

T = 6656
d = 16
UNITS = (40, 40, 40, 40)


def fused_hoist1(params, x, ct=DEFAULT_CT, unroll=DEFAULT_UNROLL, interpret=False):
    T, d = x.shape
    units = [l.units for l in params.layers]
    L = len(units)
    npgs = [_ceil_to(n, LANE) for n in units]

    l0 = params.layers[0]
    xp1 = pad_gate_cols(x @ l0.W + l0.b, units[0], npgs[0])  # (T, 4npg0) one MXU matmul

    weights = [pad_gate_cols(l0.U, units[0], npgs[0])]
    for i, l in enumerate(params.layers[1:], start=1):
        weights.append(pad_gate_cols(l.W, units[i], npgs[i]))
        weights.append(pad_gate_cols(l.U, units[i], npgs[i]))
        weights.append(pad_gate_cols(l.b.reshape(1, -1), units[i], npgs[i]))

    CT = min(ct, _ceil_to(T, 8))
    Tp = _ceil_to(T, CT)
    if Tp != T:
        xp1 = jnp.concatenate([xp1, jnp.zeros((Tp - T, xp1.shape[1]), xp1.dtype)], axis=0)
    nw = len(weights)

    def kernel(xp_ref, *refs):
        w_refs = refs[:nw]
        out_ref = refs[nw]
        scr = refs[nw + 1 :]

        @pl.when(pl.program_id(0) == 0)
        def _():
            for s in scr:
                s[:] = jnp.zeros_like(s)

        def step(t):
            z = xp_ref[pl.ds(t, 1), :] + _dot(scr[0][:, : units[0]], w_refs[0][:])
            h, c = _gates_p(z, scr[1][:], npgs[0])
            scr[0][:] = h
            scr[1][:] = c
            inp = h[:, : units[0]]
            for i in range(1, L):
                w0 = w_refs[1 + 3 * (i - 1)]
                u0 = w_refs[2 + 3 * (i - 1)]
                b0 = w_refs[3 + 3 * (i - 1)]
                z = _dot(inp, w0[:]) + _dot(scr[2 * i][:, : units[i]], u0[:]) + b0[:]
                h, c = _gates_p(z, scr[2 * i + 1][:], npgs[i])
                scr[2 * i][:] = h
                scr[2 * i + 1][:] = c
                inp = h[:, : units[i]]
            out_ref[pl.ds(t, 1), :] = scr[2 * (L - 1)][:]

        _time_loop(step, CT, unroll)

    scratch = []
    for npg in npgs:
        scratch += [pltpu.VMEM((1, npg), jnp.float32)] * 2
    h_seq = pl.pallas_call(
        kernel,
        grid=(Tp // CT,),
        out_shape=jax.ShapeDtypeStruct((Tp, npgs[-1]), jnp.float32),
        in_specs=[pl.BlockSpec((CT, 4 * npgs[0]), lambda i: (i, 0), memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * nw,
        out_specs=pl.BlockSpec((CT, npgs[-1]), lambda i: (i, 0), memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
        interpret=interpret,
    )(xp1, *weights)
    return h_seq[:T, : units[-1]] @ params.head.w + params.head.b


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(T, d)), jnp.float32)
    params = init_stacked_lstm(jax.random.PRNGKey(0), d, UNITS)
    ref = jax.jit(lambda p, xx: stacked_lstm_apply(p, xx[None], return_sequences=True)[0])(
        params, x
    )
    sig = float(jnp.abs(ref).max())

    base = jax.jit(fused_dense_stack_pallas)
    print(f"baseline fused       {device_time_ms(base, params, x, repeats=3):8.3f} ms")
    fn = jax.jit(fused_hoist1)
    err = float(jnp.abs(fn(params, x) - ref).max()) / sig
    print(f"hoisted layer-1 xp   {device_time_ms(fn, params, x, repeats=3):8.3f} ms  rel.err {err:.2e}")


if __name__ == "__main__":
    main()
