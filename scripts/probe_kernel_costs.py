"""Probe per-step primitive costs inside a Pallas fori_loop on TPU.

Variants:
  A: row-layout MXU matvec h(1,40)@U(40,160), gates, NO output writes
  B: A + buffered output writes (flush (8,n) tile every 8 steps)
  C: column-layout VPU matvec (U^T (160,40) * h-bcast, lane-reduce), gates
     on (40,1) columns, no writes
  D: C with 2D gate trick: keep 4 gate columns as (40,4) lanes
"""
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T = 6656
n = 40

rng = np.random.default_rng(0)
U = jnp.asarray(rng.normal(scale=0.2, size=(n, 4 * n)), jnp.float32)
Ut = jnp.asarray(np.asarray(U).T.copy())  # (160, 40)
xp = jnp.asarray(rng.normal(size=(T, 4 * n)), jnp.float32)
xpT = jnp.asarray(np.asarray(xp).T.copy())  # (160, T)


def bench(name, fn, *args, iters=5):
    out = jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    best = min(ts)
    print(f"{name:44s} {best*1e3:9.3f} ms  ({best/T*1e9:8.1f} ns/step)")


def gates_row(z, c):
    i = jax.nn.sigmoid(z[:, :n]); f = jax.nn.sigmoid(z[:, n:2*n])
    g = jnp.tanh(z[:, 2*n:3*n]); o = jax.nn.sigmoid(z[:, 3*n:])
    c = f * c + i * g
    return o * jnp.tanh(c), c


# --- A: MXU matvec chain, no writes
def kernel_A(xp_ref, u_ref, out_ref, h_scr, c_scr):
    h_scr[:] = jnp.zeros_like(h_scr); c_scr[:] = jnp.zeros_like(c_scr)
    u = u_ref[:]
    def body(t, _):
        z = xp_ref[pl.ds(t, 1), :] + jnp.dot(h_scr[:], u, preferred_element_type=jnp.float32)
        h, c = gates_row(z, c_scr[:])
        h_scr[:] = h; c_scr[:] = c
        return 0
    jax.lax.fori_loop(0, T, body, 0)
    out_ref[:] = h_scr[:]

A = jax.jit(lambda xp, u: pl.pallas_call(
    kernel_A,
    out_shape=jax.ShapeDtypeStruct((1, n), jnp.float32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    scratch_shapes=[pltpu.VMEM((1, n), jnp.float32)] * 2,
)(xp, u))

# --- B: A + buffered writes
def kernel_B(xp_ref, u_ref, out_ref, h_scr, c_scr, buf):
    h_scr[:] = jnp.zeros_like(h_scr); c_scr[:] = jnp.zeros_like(c_scr)
    u = u_ref[:]
    def body(t8, _):
        def inner(k, _):
            t = t8 * 8 + k
            z = xp_ref[pl.ds(t, 1), :] + jnp.dot(h_scr[:], u, preferred_element_type=jnp.float32)
            h, c = gates_row(z, c_scr[:])
            h_scr[:] = h; c_scr[:] = c
            buf[pl.ds(k, 1), :] = h
            return 0
        jax.lax.fori_loop(0, 8, inner, 0, unroll=True)
        out_ref[pl.ds(t8 * 8, 8), :] = buf[:]
        return 0
    jax.lax.fori_loop(0, T // 8, body, 0)

B = jax.jit(lambda xp, u: pl.pallas_call(
    kernel_B,
    out_shape=jax.ShapeDtypeStruct((T, n), jnp.float32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    scratch_shapes=[pltpu.VMEM((1, n), jnp.float32)] * 2 + [pltpu.VMEM((8, n), jnp.float32)],
)(xp, u))

# --- C: column-layout VPU matvec, no writes
def kernel_C(xpT_ref, ut_ref, out_ref, h_scr, c_scr):
    # h, c: (n, 1) columns; z = Ut (160,40) * h^T-bcast -> lane-reduce (160,1)
    h_scr[:] = jnp.zeros_like(h_scr); c_scr[:] = jnp.zeros_like(c_scr)
    ut = ut_ref[:]
    def body(t, _):
        hrow = h_scr[:].reshape(1, n)            # transpose (n,1)->(1,n)?
        z = jnp.sum(ut * hrow, axis=1, keepdims=True) + xpT_ref[:, pl.ds(t, 1)]
        i = jax.nn.sigmoid(z[:n]); f = jax.nn.sigmoid(z[n:2*n])
        g = jnp.tanh(z[2*n:3*n]); o = jax.nn.sigmoid(z[3*n:])
        c = f * c_scr[:] + i * g
        h = o * jnp.tanh(c)
        h_scr[:] = h; c_scr[:] = c
        return 0
    jax.lax.fori_loop(0, T, body, 0)
    out_ref[:] = h_scr[:]

C = jax.jit(lambda xpT, ut: pl.pallas_call(
    kernel_C,
    out_shape=jax.ShapeDtypeStruct((n, 1), jnp.float32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    scratch_shapes=[pltpu.VMEM((n, 1), jnp.float32)] * 2,
)(xpT, ut))

bench("A: MXU matvec, no writes", A, xp, U)
bench("B: MXU matvec + buffered writes", B, xp, U)
try:
    bench("C: VPU col matvec, no writes", C, xpT, Ut)
except Exception as e:
    print("C failed:", type(e).__name__, str(e)[:200])
