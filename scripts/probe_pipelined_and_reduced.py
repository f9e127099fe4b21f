"""Prototype: (a) layer-pipelined (systolic) fused dense kernel, (b) merged
reduced recurrence, at n in {40,128,512}. Numerics-checked, device-timed."""
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import svd_lstm_tpu as st
from svd_lstm_tpu.bench.devtime import device_time_ms
from svd_lstm_tpu.models.lstm import init_stacked_lstm, stacked_lstm_apply
from svd_lstm_tpu.ops.pallas_lstm import (
    LANE, _ceil_to, pad_gate_cols, pad_rows, pad_cols, _gates_p, _dot,
    fused_dense_stack_pallas,
)

T = 6656
CT = 512


def pipelined_fused(params, x, interpret=False):
    """Systolic: tick tau computes layer l's step at time tau-l using last
    tick's outputs — L independent dot-chains per tick."""
    Tn, d = x.shape
    units = [l.units for l in params.layers]
    L = len(units)
    npgs = [_ceil_to(n, LANE) for n in units]
    dp = _ceil_to(d, LANE)
    x_p = pad_cols(x, dp)

    weights = []
    for i, l in enumerate(params.layers):
        rows = dp if i == 0 else npgs[i - 1]
        weights.append(pad_rows(pad_gate_cols(l.W, units[i], npgs[i]), rows))
        weights.append(pad_rows(pad_gate_cols(l.U, units[i], npgs[i]), npgs[i]))
        weights.append(pad_gate_cols(l.b.reshape(1, -1), units[i], npgs[i]))

    # pad time so the pipeline drains: total ticks = T + L - 1, rounded to CT
    ticks = _ceil_to(Tn + L - 1, CT)
    x_p = jnp.concatenate([x_p, jnp.zeros((ticks - Tn, dp), x_p.dtype)], axis=0)

    def kernel(x_ref, *refs):
        w_refs = refs[: 3 * L]
        out_ref = refs[3 * L]
        scr = refs[3 * L + 1 :]
        # scr: per layer [h, c, out_prev] ; out_prev[l] = h^l from last tick

        @pl.when(pl.program_id(0) == 0)
        def _():
            for s in scr:
                s[:] = jnp.zeros_like(s)

        def body(t, _):
            tau = pl.program_id(0) * CT + t
            # read all inputs BEFORE updating (simultaneous tick semantics)
            ins = [x_ref[pl.ds(t, 1), :]] + [scr[3 * i + 2][:] for i in range(L - 1)]
            for i in range(L):
                @pl.when(tau >= i)
                def _(i=i):
                    z = (
                        _dot(ins[i], w_refs[3 * i][:])
                        + _dot(scr[3 * i][:], w_refs[3 * i + 1][:])
                        + w_refs[3 * i + 2][:]
                    )
                    h, c = _gates_p(z, scr[3 * i + 1][:], npgs[i])
                    scr[3 * i][:] = h
                    scr[3 * i + 1][:] = c
                    scr[3 * i + 2][:] = h
            out_ref[pl.ds(t, 1), :] = scr[3 * (L - 1)][:]
            return 0

        jax.lax.fori_loop(0, CT, body, 0)

    scratch = []
    for npg in npgs:
        scratch += [pltpu.VMEM((1, npg), jnp.float32)] * 3

    h_seq = pl.pallas_call(
        kernel,
        grid=(ticks // CT,),
        out_shape=jax.ShapeDtypeStruct((ticks, npgs[-1]), jnp.float32),
        in_specs=[pl.BlockSpec((CT, dp), lambda i: (i, 0), memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(weights),
        out_specs=pl.BlockSpec((CT, npgs[-1]), lambda i: (i, 0), memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
        interpret=interpret,
    )(x_p, *weights)
    # layer L's step for time t lands at tick t + L - 1
    h_seq = h_seq[L - 1 : L - 1 + Tn, : units[-1]]
    return h_seq @ params.head.w + params.head.b


rng = np.random.default_rng(0)
for units in [(40, 40, 40, 40), (128, 128, 128, 128), (512, 512, 512, 512)]:
    n = units[0]
    d = 16
    x = jnp.asarray(rng.normal(size=(T, d)), jnp.float32)
    params = init_stacked_lstm(jax.random.PRNGKey(0), d, units)
    ref = jax.jit(lambda p, xx: stacked_lstm_apply(p, xx[None], return_sequences=True)[0])

    f_pipe = jax.jit(pipelined_fused)
    y_pipe = jax.block_until_ready(f_pipe(params, x))
    y_ref = jax.block_until_ready(ref(params, x))
    err = float(jnp.abs(y_pipe - y_ref).max())

    t_scan = device_time_ms(ref, params, x, repeats=2)
    t_fused = device_time_ms(jax.jit(fused_dense_stack_pallas), params, x, repeats=2)
    t_pipe = device_time_ms(f_pipe, params, x, repeats=2)
    print(f"n={n}: scan {t_scan:7.2f}  fused {t_fused:7.2f}  pipelined {t_pipe:7.2f} ms  (err {err:.2e})", flush=True)

    # merged reduced at r = n/4
    smodel = st.make_singular_model(params, merged_kernel=True)
    rmodel = st.make_reduced_model(smodel, rank=n // 4)
    from svd_lstm_tpu.models.reduced import reduced_lstm_apply
    from svd_lstm_tpu.ops.pallas_lstm import fused_reduced_stack_pallas, reduced_forward_hybrid
    red_scan = jax.jit(lambda p, xx: reduced_lstm_apply(p, xx[None], return_sequences=True)[0])
    t_rs = device_time_ms(red_scan, rmodel, x, repeats=2)
    t_rf = device_time_ms(jax.jit(fused_reduced_stack_pallas), rmodel, x, repeats=2)
    t_rh = device_time_ms(reduced_forward_hybrid, rmodel, x, repeats=2)
    print(f"      merged reduced r={n//4}: scan {t_rs:7.2f}  fused {t_rf:7.2f}  hybrid {t_rh:7.2f} ms", flush=True)
