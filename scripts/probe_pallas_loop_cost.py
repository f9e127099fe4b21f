"""Bisect per-iteration cost inside a Pallas fori_loop on TPU v5e."""
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
Upad = jnp.zeros((n, 512), jnp.float32).at[:, 0:40].set(U[:, :40]).at[:, 128:168].set(U[:, 40:80]).at[:, 256:296].set(U[:, 80:120]).at[:, 384:424].set(U[:, 120:160])
xp = jnp.asarray(rng.normal(size=(T, 4 * n)), jnp.float32)


def mk(kernel, out_shape, scratch, *arrs):
    f = jax.jit(lambda *a: pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(arrs),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
    )(*a))
    return lambda: f(*arrs)


def bench(name, run, iters=5):
    try:
        jax.block_until_ready(run())
    except Exception as e:
        print(f"{name:40s} FAILED {type(e).__name__} {str(e)[:120]}")
        return
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(run())
        ts.append(time.perf_counter() - t0)
    best = min(ts)
    print(f"{name:40s} {best*1e3:9.3f} ms  ({best/T*1e9:8.1f} ns/step)")


# E: near-empty loop
def kE(u_ref, out_ref, h):
    h[:] = jnp.zeros_like(h)
    def body(t, _):
        h[:] = h[:] + 1.0
        return 0
    jax.lax.fori_loop(0, T, body, 0)
    out_ref[:] = h[:]
bench("E: h+=1 only", mk(kE, jax.ShapeDtypeStruct((1, n), jnp.float32),
                        [pltpu.VMEM((1, n), jnp.float32)], U))

# F: only the dot
def kF(u_ref, out_ref, h):
    h[:] = jnp.full_like(h, 0.01)
    u = u_ref[:]
    def body(t, _):
        z = jnp.dot(h[:], u, preferred_element_type=jnp.float32)
        h[:] = z[:, :n] * 1e-4
        return 0
    jax.lax.fori_loop(0, T, body, 0)
    out_ref[:] = h[:]
bench("F: dot(1x40,40x160)+slice", mk(kF, jax.ShapeDtypeStruct((1, n), jnp.float32),
                                      [pltpu.VMEM((1, n), jnp.float32)], U))

# G: only transcendentals
def kG(u_ref, out_ref, h):
    h[:] = jnp.full_like(h, 0.01)
    def body(t, _):
        a = jax.nn.sigmoid(h[:]); b = jnp.tanh(h[:])
        c = jax.nn.sigmoid(a); d = jax.nn.sigmoid(b)
        h[:] = a * b + c * d
        return 0
    jax.lax.fori_loop(0, T, body, 0)
    out_ref[:] = h[:]
bench("G: 4 transcendentals", mk(kG, jax.ShapeDtypeStruct((1, n), jnp.float32),
                                 [pltpu.VMEM((1, n), jnp.float32)], U))

# H: full body with unroll 8
def kH(xp_ref, u_ref, out_ref, h_scr, c_scr):
    h_scr[:] = jnp.zeros_like(h_scr); c_scr[:] = jnp.zeros_like(c_scr)
    u = u_ref[:]
    def body(t, _):
        z = xp_ref[pl.ds(t, 1), :] + jnp.dot(h_scr[:], u, preferred_element_type=jnp.float32)
        i = jax.nn.sigmoid(z[:, :n]); f = jax.nn.sigmoid(z[:, n:2*n])
        g = jnp.tanh(z[:, 2*n:3*n]); o = jax.nn.sigmoid(z[:, 3*n:])
        c = f * c_scr[:] + i * g
        h = o * jnp.tanh(c)
        h_scr[:] = h; c_scr[:] = c
        return 0
    jax.lax.fori_loop(0, T, body, 0, unroll=8)
    out_ref[:] = h_scr[:]
bench("H: full body unroll=8", mk(kH, jax.ShapeDtypeStruct((1, n), jnp.float32),
                                  [pltpu.VMEM((1, n), jnp.float32)] * 2, xp, U))

# I: padded-gate layout, lane-aligned slices
def kI(xp_ref, u_ref, out_ref, h_scr, c_scr):
    h_scr[:] = jnp.zeros_like(h_scr); c_scr[:] = jnp.zeros_like(c_scr)
    u = u_ref[:]
    def body(t, _):
        z = jnp.dot(h_scr[:], u, preferred_element_type=jnp.float32)
        i = jax.nn.sigmoid(z[:, 0:128]); f = jax.nn.sigmoid(z[:, 128:256])
        g = jnp.tanh(z[:, 256:384]); o = jax.nn.sigmoid(z[:, 384:512])
        c = f * c_scr[:] + i * g
        h = o * jnp.tanh(c)
        h_scr[:, :n] = h[:, :n]; c_scr[:] = c
        return 0
    jax.lax.fori_loop(0, T, body, 0)
    out_ref[:] = h_scr[:]
bench("I: padded gates (1,128) state", mk(kI, jax.ShapeDtypeStruct((1, 128), jnp.float32),
                                          [pltpu.VMEM((1, 128), jnp.float32)] * 2, xp, Upad))

# J: dot with bf16 weights
Ubf = U.astype(jnp.bfloat16)
def kJ(u_ref, out_ref, h):
    h[:] = jnp.full_like(h, 0.01)
    u = u_ref[:]
    def body(t, _):
        z = jnp.dot(h[:].astype(jnp.bfloat16), u, preferred_element_type=jnp.float32)
        h[:] = z[:, :n] * 1e-4
        return 0
    jax.lax.fori_loop(0, T, body, 0)
    out_ref[:] = h[:]
bench("J: bf16 dot", mk(kJ, jax.ShapeDtypeStruct((1, n), jnp.float32),
                        [pltpu.VMEM((1, n), jnp.float32)], Ubf))

# K: 8 independent dots per iter (amortize): does MXU pipeline?
def kK(u_ref, out_ref, h):
    h[:] = jnp.full_like(h, 0.01)
    u = u_ref[:]
    def body(t, _):
        z = jnp.dot(h[:], u, preferred_element_type=jnp.float32)
        for _ in range(7):
            z = z + jnp.dot(z[:, :n] * 1e-4, u, preferred_element_type=jnp.float32)
        h[:] = z[:, :n] * 1e-4
        return 0
    jax.lax.fori_loop(0, T // 8, body, 0)
    out_ref[:] = h[:]
bench("K: 8 chained dots, T/8 iters", mk(kK, jax.ShapeDtypeStruct((1, n), jnp.float32),
                                         [pltpu.VMEM((1, n), jnp.float32)], U))
