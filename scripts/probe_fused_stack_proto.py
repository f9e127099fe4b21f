"""Prototype: fused 4-layer LSTM in padded-gate (P) layout, grid-chunked over
time. Validate numerics vs XLA scan and measure."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import svd_lstm_tpu  # matmul precision
from svd_lstm_tpu.models.lstm import init_stacked_lstm, stacked_lstm_apply

T = 6656
CT = 512  # time chunk
d = 16
units = (40, 40, 40, 40)
L = len(units)
n = 40
NP = 128          # padded state lanes
GP = 4 * NP       # padded gate lanes

params = init_stacked_lstm(jax.random.PRNGKey(0), d, units)
rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(T, d)), jnp.float32)


def pad_gates_cols(M, n):
    """(rows, 4n) -> (rows, GP) with gate g at lanes [g*NP, g*NP+n)."""
    out = np.zeros((M.shape[0], GP), np.float32)
    for g in range(4):
        out[:, g * NP : g * NP + n] = M[:, g * n : (g + 1) * n]
    return out


def pad_rows(M, rows):
    out = np.zeros((rows, M.shape[1]), np.float32)
    out[: M.shape[0]] = M
    return out


Ws, Us, Bs = [], [], []
for i, l in enumerate(params.layers):
    Wp = pad_gates_cols(np.asarray(l.W), n)          # (d or n, GP)
    Wp = pad_rows(Wp, NP if i > 0 else NP)           # rows padded to 128
    Us.append(jnp.asarray(pad_rows(pad_gates_cols(np.asarray(l.U), n), NP)))
    Ws.append(jnp.asarray(Wp))
    Bs.append(jnp.asarray(pad_gates_cols(np.asarray(l.b)[None], n)))

xpad = jnp.zeros((T, NP), jnp.float32).at[:, :d].set(x)


def kernel(x_ref, *refs):
    w_refs = refs[:L]
    u_refs = refs[L : 2 * L]
    b_refs = refs[2 * L : 3 * L]
    out_ref = refs[3 * L]
    scr = refs[3 * L + 1 :]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for i in range(L):
            scr[2 * i][:] = jnp.zeros_like(scr[2 * i])
            scr[2 * i + 1][:] = jnp.zeros_like(scr[2 * i + 1])

    def body(t, _):
        inp = x_ref[pl.ds(t, 1), :]
        for i in range(L):
            z = (
                jnp.dot(inp, w_refs[i][:], preferred_element_type=jnp.float32)
                + jnp.dot(scr[2 * i][:], u_refs[i][:], preferred_element_type=jnp.float32)
                + b_refs[i][:]
            )
            ig = jax.nn.sigmoid(z[:, 0:NP])
            fg = jax.nn.sigmoid(z[:, NP : 2 * NP])
            gg = jnp.tanh(z[:, 2 * NP : 3 * NP])
            og = jax.nn.sigmoid(z[:, 3 * NP :])
            c = fg * scr[2 * i + 1][:] + ig * gg
            h = og * jnp.tanh(c)
            scr[2 * i][:] = h
            scr[2 * i + 1][:] = c
            inp = h
        out_ref[pl.ds(t, 1), :] = inp
        return 0

    jax.lax.fori_loop(0, CT, body, 0)


grid = (T // CT,)
fused = jax.jit(lambda xp, *ops: pl.pallas_call(
    kernel,
    grid=grid,
    out_shape=jax.ShapeDtypeStruct((T, NP), jnp.float32),
    in_specs=[pl.BlockSpec((CT, NP), lambda i: (i, 0), memory_space=pltpu.VMEM)]
    + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (3 * L),
    out_specs=pl.BlockSpec((CT, NP), lambda i: (i, 0), memory_space=pltpu.VMEM),
    scratch_shapes=[pltpu.VMEM((1, NP), jnp.float32)] * (2 * L),
)(xp, *ops))


def run():
    h_seq = fused(xpad, *Ws, *Us, *Bs)
    return h_seq[:, :n] @ params.head.w + params.head.b


y = jax.block_until_ready(run())
ref = stacked_lstm_apply(params, x[None])[0]
print("max abs err vs scan:", float(jnp.abs(y - ref).max()))

ts = []
for _ in range(10):
    t0 = time.perf_counter()
    jax.block_until_ready(run())
    ts.append(time.perf_counter() - t0)
best = min(ts)
print(f"fused P-layout: {best*1e3:.3f} ms  ({best/T*1e9:.1f} ns/step)")
