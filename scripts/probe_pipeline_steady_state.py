"""(a) Pipelined fused kernel, steady-state unguarded (prologue handles
warmup by feeding zero frames and resetting junk state after); (b) batched
throughput full vs reduced."""
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import svd_lstm_tpu as st
from svd_lstm_tpu.bench.devtime import device_time_ms
from svd_lstm_tpu.models.lstm import init_stacked_lstm, stacked_lstm_apply
from svd_lstm_tpu.models.reduced import reduced_lstm_apply
from svd_lstm_tpu.ops.pallas_lstm import (
    LANE, _ceil_to, pad_gate_cols, pad_rows, pad_cols, _gates_p, _dot,
)
from svd_lstm_tpu.ops.layouts import reduced_forward_dense_recurrent

T = 6656
CT = 512


def pipelined_fused_v2(params, x, interpret=False):
    """Trick: layer l runs unguarded from tick 0 on junk inputs, but we
    RE-ZERO its state at the tick where its real stream begins. State reset
    for layer l happens at tick l-1 (when layer l-1 first emits real data).
    Implemented with a cheap scalar select per layer per tick — vector work
    stays branchless."""
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

    ticks = _ceil_to(Tn + L - 1, CT)
    x_p = jnp.concatenate([x_p, jnp.zeros((ticks - Tn, dp), x_p.dtype)], axis=0)

    def kernel(x_ref, *refs):
        w_refs = refs[: 3 * L]
        out_ref = refs[3 * L]
        scr = refs[3 * L + 1 :]

        @pl.when(pl.program_id(0) == 0)
        def _():
            for s in scr:
                s[:] = jnp.zeros_like(s)

        def body(t, _):
            tau = pl.program_id(0) * CT + t
            ins = [x_ref[pl.ds(t, 1), :]] + [scr[3 * i + 2][:] for i in range(L - 1)]
            for i in range(L):
                # zero the state exactly when layer i's real stream starts
                live = (tau > i) if i > 0 else True
                gate_mask = jnp.float32(1.0) if i == 0 else jnp.where(tau > i, 1.0, 0.0)
                h_prev = scr[3 * i][:] * gate_mask
                c_prev = scr[3 * i + 1][:] * gate_mask
                z = (
                    _dot(ins[i], w_refs[3 * i][:])
                    + _dot(h_prev, w_refs[3 * i + 1][:])
                    + w_refs[3 * i + 2][:]
                )
                h, c = _gates_p(z, c_prev, npgs[i])
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
    h_seq = h_seq[L - 1 : L - 1 + Tn, : units[-1]]
    return h_seq @ params.head.w + params.head.b


rng = np.random.default_rng(0)
units = (40, 40, 40, 40)
d = 16
x = jnp.asarray(rng.normal(size=(T, d)), jnp.float32)
params = init_stacked_lstm(jax.random.PRNGKey(0), d, units)
ref = jax.jit(lambda p, xx: stacked_lstm_apply(p, xx[None], return_sequences=True)[0])
f2 = jax.jit(pipelined_fused_v2)

y2 = jax.block_until_ready(f2(params, x))
y_ref = jax.block_until_ready(ref(params, x))
err = float(jnp.abs(y2 - y_ref).max())
t_scan = device_time_ms(ref, params, x, repeats=2)
t_pipe2 = device_time_ms(f2, params, x, repeats=2)
print(f"scan {t_scan:.2f} ms   pipelined-v2 {t_pipe2:.2f} ms   err {err:.2e}", flush=True)

# ---- (b) batched throughput: 256 sequences of 512 steps
B, Tb = 256, 512
xb = jnp.asarray(rng.normal(size=(B, Tb, d)), jnp.float32)
smodel = st.make_singular_model(params, merged_kernel=False)
for r in (10, 20, 30):
    rmodel = st.make_reduced_model(smodel, rank=r)
    full_b = jax.jit(lambda p, xx: stacked_lstm_apply(p, xx, return_sequences=False))
    red_b = jax.jit(lambda p, xx: reduced_lstm_apply(p, xx, return_sequences=False))
    red_b_layout = jax.jit(
        lambda p, xx: reduced_forward_dense_recurrent(p, xx, return_sequences=False)
    )
    tf_ = device_time_ms(full_b, params, xb, repeats=2)
    tr_ = device_time_ms(red_b, rmodel, xb, repeats=2)
    tr2_ = device_time_ms(red_b_layout, rmodel, xb, repeats=2)
    print(f"batched B={B} T={Tb} r={r}: full {tf_:.2f}  red(2step) {tr_:.2f} ({tr_/tf_:.3f})  "
          f"red(layout) {tr2_:.2f} ({tr2_/tf_:.3f})", flush=True)
