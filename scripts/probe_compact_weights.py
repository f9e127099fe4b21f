"""Compact-weight kernels: drop the row padding of U/W (slice h to n lanes
before the dot) -> fewer VMEM tiles streamed per step. Verify + time."""
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import svd_lstm_tpu as st
from svd_lstm_tpu.bench.devtime import device_time_ms
from svd_lstm_tpu.models.lstm import init_stacked_lstm, stacked_lstm_apply
from svd_lstm_tpu.ops.pallas_lstm import LANE, _ceil_to, pad_gate_cols, pad_cols, _gates_p, _dot

T = 6656
CT = 512
n = 40
NP = 128
GP = 512
d = 16

rng = np.random.default_rng(0)
params = init_stacked_lstm(jax.random.PRNGKey(0), d, (n, n, n, n))
x = jnp.asarray(rng.normal(size=(T, d)), jnp.float32)
L = 4

# compact weights: rows NOT padded to 128; gate cols padded to 128 blocks
Ws, Us, Bs = [], [], []
for i, l in enumerate(params.layers):
    Ws.append(pad_gate_cols(l.W, n, NP))          # (d or n, 512)
    Us.append(pad_gate_cols(l.U, n, NP))          # (n, 512)
    Bs.append(pad_gate_cols(l.b.reshape(1, -1), n, NP))

x_p = pad_cols(x, NP)


def kernel(x_ref, *refs):
    w_refs = refs[:L]
    u_refs = refs[L:2*L]
    b_refs = refs[2*L:3*L]
    out_ref = refs[3*L]
    scr = refs[3*L+1:]

    @pl.when(pl.program_id(0) == 0)
    def _():
        for s in scr:
            s[:] = jnp.zeros_like(s)

    def body(t, _):
        inp = x_ref[pl.ds(t, 1), :d]          # (1, d) compact
        for i in range(L):
            z = (
                _dot(inp, w_refs[i][:])
                + _dot(scr[2*i][:, :n], u_refs[i][:])
                + b_refs[i][:]
            )
            h, c = _gates_p(z, scr[2*i+1][:], NP)
            scr[2*i][:] = h
            scr[2*i+1][:] = c
            inp = h[:, :n]                    # compact slice for next layer
        out_ref[pl.ds(t, 1), :] = scr[2*(L-1)][:]
        return 0

    jax.lax.fori_loop(0, CT, body, 0)


f = jax.jit(lambda xp, *ops: pl.pallas_call(
    kernel,
    grid=(T // CT,),
    out_shape=jax.ShapeDtypeStruct((T, NP), jnp.float32),
    in_specs=[pl.BlockSpec((CT, NP), lambda i: (i, 0), memory_space=pltpu.VMEM)]
    + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (3 * L),
    out_specs=pl.BlockSpec((CT, NP), lambda i: (i, 0), memory_space=pltpu.VMEM),
    scratch_shapes=[pltpu.VMEM((1, NP), jnp.float32)] * (2 * L),
)(xp, *ops))


def run():
    h_seq = f(x_p, *Ws, *Us, *Bs)
    return h_seq[:, :n] @ params.head.w + params.head.b


ref = jax.jit(lambda p, xx: stacked_lstm_apply(p, xx[None], return_sequences=True)[0])
y = jax.block_until_ready(run())
yr = jax.block_until_ready(ref(params, x))
err = float(jnp.abs(y - yr).max())
t_scan = device_time_ms(ref, params, x, repeats=2)
t_compact = device_time_ms(jax.jit(run), repeats=3)
print(f"scan {t_scan:.3f} ms   compact fused {t_compact:.3f} ms   err {err:.2e}", flush=True)
