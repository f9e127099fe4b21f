"""Correctness-check the 'fast' V1 kernel against XLA scan, then re-time both
with multiple shapes. Timing only counts if numerics are exact."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import svd_lstm_tpu  # noqa
from svd_lstm_tpu.ops.recurrence import lstm_recurrence_xla

T = 6656
CT = 512
NP = 128
GP = 512
n = 40

rng = np.random.default_rng(0)
U = rng.normal(scale=0.2, size=(n, 4 * n)).astype(np.float32)
Upad = np.zeros((NP, GP), np.float32)
for g in range(4):
    Upad[:n, g * NP : g * NP + n] = U[:, g * n : (g + 1) * n]
Upad = jnp.asarray(Upad)
xp_small = rng.normal(size=(T, 4 * n)).astype(np.float32)
xp = np.zeros((T, GP), np.float32)
for g in range(4):
    xp[:, g * NP : g * NP + n] = xp_small[:, g * n : (g + 1) * n]
xp = jnp.asarray(xp)


def kernel(xp_ref, u_ref, out_ref, h, c):
    @pl.when(pl.program_id(0) == 0)
    def _():
        h[:] = jnp.zeros_like(h)
        c[:] = jnp.zeros_like(c)

    def body(t, _):
        z = xp_ref[pl.ds(t, 1), :] + jnp.dot(h[:], u_ref[:], preferred_element_type=jnp.float32)
        i = jax.nn.sigmoid(z[:, 0:NP]); f = jax.nn.sigmoid(z[:, NP:2*NP])
        g = jnp.tanh(z[:, 2*NP:3*NP]); o = jax.nn.sigmoid(z[:, 3*NP:])
        cn = f * c[:] + i * g
        hn = o * jnp.tanh(cn)
        h[:] = hn; c[:] = cn
        out_ref[pl.ds(t, 1), :] = hn
        return 0

    jax.lax.fori_loop(0, CT, body, 0)


f = jax.jit(lambda a, b: pl.pallas_call(
    kernel,
    grid=(T // CT,),
    out_shape=jax.ShapeDtypeStruct((T, NP), jnp.float32),
    in_specs=[
        pl.BlockSpec((CT, GP), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ],
    out_specs=pl.BlockSpec((CT, NP), lambda i: (i, 0), memory_space=pltpu.VMEM),
    scratch_shapes=[pltpu.VMEM((1, NP), jnp.float32)] * 2,
)(a, b))

h_seq = jax.block_until_ready(f(xp, Upad))[:, :n]
ref = lstm_recurrence_xla(
    jnp.asarray(xp_small)[None], jnp.asarray(U), jnp.zeros((1, n)), jnp.zeros((1, n))
)[0]
err = float(jnp.abs(h_seq - ref).max())
print("max abs err vs scan:", err)

ts = []
for _ in range(20):
    t0 = time.perf_counter()
    jax.block_until_ready(f(xp, Upad))
    ts.append(time.perf_counter() - t0)
print(f"pallas single layer: best {min(ts)*1e3:.3f} ms  median {sorted(ts)[10]*1e3:.3f} ms ({min(ts)/T*1e9:.1f} ns/step)")

g = jax.jit(lambda a, b: lstm_recurrence_xla(a, b, jnp.zeros((1, n)), jnp.zeros((1, n))))
jax.block_until_ready(g(jnp.asarray(xp_small)[None], jnp.asarray(U)))
ts = []
for _ in range(20):
    t0 = time.perf_counter()
    jax.block_until_ready(g(jnp.asarray(xp_small)[None], jnp.asarray(U)))
    ts.append(time.perf_counter() - t0)
print(f"xla scan single layer: best {min(ts)*1e3:.3f} ms ({min(ts)/T*1e9:.1f} ns/step)")
