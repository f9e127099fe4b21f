"""Probe: unroll the fused dense stack kernel's time loop (UNROLL steps per
fori_loop iteration) to amortize loop-management overhead at the headline
operating point (4x40, T=6656, batch-1)."""
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
UNITS = (40, 40, 40, 40)


def fused_unrolled(params, x, unroll=2, ct=DEFAULT_CT, interpret=False):
    T, d = x.shape
    units = [l.units for l in params.layers]
    L = len(units)
    npgs = [_ceil_to(n, LANE) for n in units]
    dp = _ceil_to(d, LANE)
    x_p = pad_cols(x, dp)
    weights = []
    for i, l in enumerate(params.layers):
        weights.append(pad_gate_cols(l.W, units[i], npgs[i]))
        weights.append(pad_gate_cols(l.U, units[i], npgs[i]))
        weights.append(pad_gate_cols(l.b.reshape(1, -1), units[i], npgs[i]))
    CT = min(ct, _ceil_to(T, 8))
    assert CT % unroll == 0
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

        def substep(t):
            inp = x_ref[pl.ds(t, 1), :d]
            for i in range(L):
                z = (
                    _dot(inp, w_refs[3 * i][:])
                    + _dot(scr[2 * i][:, : units[i]], w_refs[3 * i + 1][:])
                    + w_refs[3 * i + 2][:]
                )
                h, c = _gates_p(z, scr[2 * i + 1][:], npgs[i])
                scr[2 * i][:] = h
                scr[2 * i + 1][:] = c
                inp = h[:, : units[i]]
            out_ref[pl.ds(t, 1), :] = scr[2 * (L - 1)][:]

        def body(j, _):
            for k in range(unroll):
                substep(j * unroll + k)
            return 0

        jax.lax.fori_loop(0, CT // unroll, body, 0)

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
    h_seq = h_seq[:T, : units[-1]]
    return h_seq @ params.head.w + params.head.b


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
    ms = device_time_ms(base, params, x, repeats=3)
    print(f"unroll=1 (baseline)  {ms:8.3f} ms  ({ms*1e3/T:6.3f} us/step)")

    for u in (2, 4, 8):
        fn = jax.jit(functools.partial(fused_unrolled, unroll=u))
        try:
            err = float(jnp.abs(fn(params, x) - ref).max()) / sig
            ms = device_time_ms(fn, params, x, repeats=3)
            print(f"unroll={u}            {ms:8.3f} ms  ({ms*1e3/T:6.3f} us/step)  rel.err {err:.2e}")
        except Exception as e:
            print(f"unroll={u} FAILED: {str(e)[:150]}".replace("\n", " "))


if __name__ == "__main__":
    main()
