"""Decompose the ~1.3us/layer-step floor. Single layer, P-layout, grid-chunked.
All variants keep a sequential dependence and write real output."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import svd_lstm_tpu  # noqa

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
xp = jnp.asarray(rng.normal(size=(T, GP)).astype(np.float32))


def mk(body_fn, n_scr=2, extra_ops=()):
    def kernel(xp_ref, u_ref, out_ref, *scr):
        @pl.when(pl.program_id(0) == 0)
        def _():
            for s in scr:
                s[:] = jnp.zeros_like(s)

        def body(t, _):
            body_fn(t, xp_ref, u_ref, out_ref, scr)
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
        scratch_shapes=[pltpu.VMEM((1, NP), jnp.float32)] * n_scr
        + [pltpu.VMEM((8, NP), jnp.float32)],
    )(a, b))
    return f


def bench(name, f, iters=10):
    try:
        out = jax.block_until_ready(f(xp, Upad))
    except Exception as e:
        print(f"{name:46s} FAILED {type(e).__name__}: {str(e)[:100]}")
        return None
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(f(xp, Upad))
        ts.append(time.perf_counter() - t0)
    best = min(ts)
    print(f"{name:46s} {best*1e3:9.3f} ms  ({best/T*1e9:8.1f} ns/step)  checksum={float(jnp.sum(out)):.4f}")
    return best


def gates(z, c):
    i = jax.nn.sigmoid(z[:, 0:NP]); f = jax.nn.sigmoid(z[:, NP:2*NP])
    g = jnp.tanh(z[:, 2*NP:3*NP]); o = jax.nn.sigmoid(z[:, 3*NP:])
    c2 = f * c + i * g
    return o * jnp.tanh(c2), c2


# V1: full body, per-step write
def b1(t, xp_ref, u_ref, out_ref, scr):
    h, c, buf = scr
    z = xp_ref[pl.ds(t, 1), :] + jnp.dot(h[:], u_ref[:], preferred_element_type=jnp.float32)
    hn, cn = gates(z, c[:])
    h[:] = hn; c[:] = cn
    out_ref[pl.ds(t, 1), :] = hn

# V2: full body, no per-step write (only final state at t==CT-1)
def b2(t, xp_ref, u_ref, out_ref, scr):
    h, c, buf = scr
    z = xp_ref[pl.ds(t, 1), :] + jnp.dot(h[:], u_ref[:], preferred_element_type=jnp.float32)
    hn, cn = gates(z, c[:])
    h[:] = hn; c[:] = cn
    @pl.when(t == CT - 1)
    def _():
        out_ref[pl.ds(t, 1), :] = hn

# V3: no dot (h*const recurrence), with write
def b3(t, xp_ref, u_ref, out_ref, scr):
    h, c, buf = scr
    z = xp_ref[pl.ds(t, 1), :]
    zz = z.at[:, :NP].add(h[:])  # keep dependence without dot
    hn, cn = gates(zz, c[:])
    h[:] = hn; c[:] = cn
    out_ref[pl.ds(t, 1), :] = hn

# V4: dot but no gates (linear recurrence), with write
def b4(t, xp_ref, u_ref, out_ref, scr):
    h, c, buf = scr
    z = xp_ref[pl.ds(t, 1), :] + jnp.dot(h[:], u_ref[:], preferred_element_type=jnp.float32)
    hn = jnp.tanh(z[:, 0:NP])
    h[:] = hn
    out_ref[pl.ds(t, 1), :] = hn

# V5: full body, static xp row (no dynamic read), write buffered at end
def b5(t, xp_ref, u_ref, out_ref, scr):
    h, c, buf = scr
    z = xp_ref[0:1, :] + jnp.dot(h[:], u_ref[:], preferred_element_type=jnp.float32)
    hn, cn = gates(z, c[:])
    h[:] = hn; c[:] = cn
    out_ref[pl.ds(t, 1), :] = hn

bench("V1 full body + per-step write", mk(b1))
bench("V2 full body, write last only", mk(b2))
bench("V3 no dot + write", mk(b3))
bench("V4 dot, tanh only + write", mk(b4))
bench("V5 static xp read + write", mk(b5))
