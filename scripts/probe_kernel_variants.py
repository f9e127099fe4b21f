"""Variants on the verified single-layer kernel: hoisted U load, manual
unroll, per-gate dots, bf16. Every variant numerics-checked vs scan."""
import functools
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import svd_lstm_tpu  # noqa
from svd_lstm_tpu.ops.recurrence import lstm_recurrence_xla

T = 6656
NP = 128
GP = 512
n = 40

rng = np.random.default_rng(0)
U = rng.normal(scale=0.2, size=(n, 4 * n)).astype(np.float32)
Upad = np.zeros((NP, GP), np.float32)
for g in range(4):
    Upad[:n, g * NP : g * NP + n] = U[:, g * n : (g + 1) * n]
xp_small = rng.normal(size=(T, 4 * n)).astype(np.float32)
xpP = np.zeros((T, GP), np.float32)
for g in range(4):
    xpP[:, g * NP : g * NP + n] = xp_small[:, g * n : (g + 1) * n]

ref = lstm_recurrence_xla(
    jnp.asarray(xp_small)[None], jnp.asarray(U), jnp.zeros((1, n)), jnp.zeros((1, n))
)[0]


def run_and_check(name, f, *args, atol=1e-4):
    try:
        out = jax.block_until_ready(f(*args))
    except Exception as e:
        print(f"{name:42s} FAILED {type(e).__name__}: {str(e)[:110]}")
        return
    err = float(jnp.abs(out[:, :n] - ref).max())
    ts = []
    for _ in range(10):
        t0 = time.perf_counter()
        jax.block_until_ready(f(*args))
        ts.append(time.perf_counter() - t0)
    ok = "OK " if err < atol else f"ERR={err:.2e}"
    print(f"{name:42s} {min(ts)*1e3:9.3f} ms ({min(ts)/T*1e9:7.1f} ns/step) {ok}")


def gates(z, c):
    i = jax.nn.sigmoid(z[:, 0:NP]); f = jax.nn.sigmoid(z[:, NP:2*NP])
    g = jnp.tanh(z[:, 2*NP:3*NP]); o = jax.nn.sigmoid(z[:, 3*NP:])
    c2 = f * c + i * g
    return o * jnp.tanh(c2), c2


def call(kernel, CT, udt=jnp.float32, upad=None):
    upad = Upad if upad is None else upad
    return jax.jit(functools.partial(
        pl.pallas_call(
            kernel,
            grid=(T // CT,),
            out_shape=jax.ShapeDtypeStruct((T, NP), jnp.float32),
            in_specs=[
                pl.BlockSpec((CT, GP), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((CT, NP), lambda i: (i, 0), memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((1, NP), jnp.float32)] * 2,
        )), )


# X2: hoisted u load
def make(CT, body_builder, u_arr):
    def kernel(xp_ref, u_ref, out_ref, h, c):
        @pl.when(pl.program_id(0) == 0)
        def _():
            h[:] = jnp.zeros_like(h); c[:] = jnp.zeros_like(c)
        body_builder(xp_ref, u_ref, out_ref, h, c, CT)

    return jax.jit(lambda a, b: pl.pallas_call(
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


def bb_hoist(xp_ref, u_ref, out_ref, h, c, CT):
    u = u_ref[:]
    def body(t, _):
        z = xp_ref[pl.ds(t, 1), :] + jnp.dot(h[:], u, preferred_element_type=jnp.float32)
        hn, cn = gates(z, c[:])
        h[:] = hn; c[:] = cn
        out_ref[pl.ds(t, 1), :] = hn
        return 0
    jax.lax.fori_loop(0, CT, body, 0)


def bb_unroll8(xp_ref, u_ref, out_ref, h, c, CT):
    u = u_ref[:]
    def body(t8, _):
        for k in range(8):
            t = t8 * 8 + k
            z = xp_ref[pl.ds(t, 1), :] + jnp.dot(h[:], u, preferred_element_type=jnp.float32)
            hn, cn = gates(z, c[:])
            h[:] = hn; c[:] = cn
            out_ref[pl.ds(t, 1), :] = hn
        return 0
    jax.lax.fori_loop(0, CT // 8, body, 0)


def bb_pergate(xp_ref, u_ref, out_ref, h, c, CT):
    def body(t, _):
        hh = h[:]
        zi = jnp.dot(hh, u_ref[:, 0:NP], preferred_element_type=jnp.float32)
        zf = jnp.dot(hh, u_ref[:, NP:2*NP], preferred_element_type=jnp.float32)
        zg = jnp.dot(hh, u_ref[:, 2*NP:3*NP], preferred_element_type=jnp.float32)
        zo = jnp.dot(hh, u_ref[:, 3*NP:], preferred_element_type=jnp.float32)
        xr = xp_ref[pl.ds(t, 1), :]
        i = jax.nn.sigmoid(xr[:, 0:NP] + zi)
        f = jax.nn.sigmoid(xr[:, NP:2*NP] + zf)
        g = jnp.tanh(xr[:, 2*NP:3*NP] + zg)
        o = jax.nn.sigmoid(xr[:, 3*NP:] + zo)
        cn = f * c[:] + i * g
        hn = o * jnp.tanh(cn)
        h[:] = hn; c[:] = cn
        out_ref[pl.ds(t, 1), :] = hn
        return 0
    jax.lax.fori_loop(0, CT, body, 0)


xpP_j = jnp.asarray(xpP)
Upad_j = jnp.asarray(Upad)

run_and_check("X2 hoisted-u CT=512", make(512, bb_hoist, Upad_j), xpP_j, Upad_j)
run_and_check("X3 unroll8 CT=512", make(512, bb_unroll8, Upad_j), xpP_j, Upad_j)
run_and_check("X4 per-gate dots CT=512", make(512, bb_pergate, Upad_j), xpP_j, Upad_j)
run_and_check("X7a hoisted-u CT=128", make(128, bb_hoist, Upad_j), xpP_j, Upad_j)
run_and_check("X7b hoisted-u CT=6656", make(6656, bb_hoist, Upad_j), xpP_j, Upad_j)
