"""Find which combination explodes the per-step cost."""
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
xp = jnp.asarray(rng.normal(size=(T, 4 * n)), jnp.float32)
Upad = jnp.zeros((128, 512), jnp.float32)
Upad = Upad.at[:40, 0:40].set(U[:, :40]).at[:40, 128:168].set(U[:, 40:80]) \
           .at[:40, 256:296].set(U[:, 80:120]).at[:40, 384:424].set(U[:, 120:160])
xpad = jnp.zeros((T, 512), jnp.float32)
xpad = xpad.at[:, 0:40].set(xp[:, :40]).at[:, 128:168].set(xp[:, 40:80]) \
           .at[:, 256:296].set(xp[:, 80:120]).at[:, 384:424].set(xp[:, 120:160])


def mk(kernel, out_shape, scratch, *arrs):
    f = jax.jit(lambda *a: pl.pallas_call(
        kernel, out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(arrs),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
    )(*a))
    return lambda: f(*arrs)


def bench(name, run, iters=5):
    try:
        jax.block_until_ready(run())
    except Exception as e:
        print(f"{name:44s} FAILED {type(e).__name__} {str(e)[:120]}")
        return
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(run())
        ts.append(time.perf_counter() - t0)
    print(f"{name:44s} {min(ts)*1e3:9.3f} ms  ({min(ts)/T*1e9:8.1f} ns/step)")


# F2: dot + dynamic xp row read
def kF2(xp_ref, u_ref, out_ref, h):
    h[:] = jnp.full_like(h, 0.01)
    u = u_ref[:]
    def body(t, _):
        z = xp_ref[pl.ds(t, 1), :] + jnp.dot(h[:], u, preferred_element_type=jnp.float32)
        h[:] = z[:, :n] * 1e-4
        return 0
    jax.lax.fori_loop(0, T, body, 0)
    out_ref[:] = h[:]
bench("F2: dot + xp row read", mk(kF2, jax.ShapeDtypeStruct((1, n), jnp.float32),
                                  [pltpu.VMEM((1, n), jnp.float32)], xp, U))

# F3: dot + unaligned lane slices + gate math (no xp read)
def kF3(u_ref, out_ref, h, c):
    h[:] = jnp.full_like(h, 0.01); c[:] = jnp.zeros_like(c)
    u = u_ref[:]
    def body(t, _):
        z = jnp.dot(h[:], u, preferred_element_type=jnp.float32)
        i = jax.nn.sigmoid(z[:, :n]); f = jax.nn.sigmoid(z[:, n:2*n])
        g = jnp.tanh(z[:, 2*n:3*n]); o = jax.nn.sigmoid(z[:, 3*n:])
        cc = f * c[:] + i * g
        h[:] = o * jnp.tanh(cc); c[:] = cc
        return 0
    jax.lax.fori_loop(0, T, body, 0)
    out_ref[:] = h[:]
bench("F3: dot + gate slices (no xp)", mk(kF3, jax.ShapeDtypeStruct((1, n), jnp.float32),
                                          [pltpu.VMEM((1, n), jnp.float32)] * 2, U))

# F4: static xp read (row 0) + dot + gates
def kF4(xp_ref, u_ref, out_ref, h, c):
    h[:] = jnp.full_like(h, 0.01); c[:] = jnp.zeros_like(c)
    u = u_ref[:]
    def body(t, _):
        z = xp_ref[0:1, :] + jnp.dot(h[:], u, preferred_element_type=jnp.float32)
        i = jax.nn.sigmoid(z[:, :n]); f = jax.nn.sigmoid(z[:, n:2*n])
        g = jnp.tanh(z[:, 2*n:3*n]); o = jax.nn.sigmoid(z[:, 3*n:])
        cc = f * c[:] + i * g
        h[:] = o * jnp.tanh(cc); c[:] = cc
        return 0
    jax.lax.fori_loop(0, T, body, 0)
    out_ref[:] = h[:]
bench("F4: static xp read + dot + gates", mk(kF4, jax.ShapeDtypeStruct((1, n), jnp.float32),
                                             [pltpu.VMEM((1, n), jnp.float32)] * 2, xp, U))

# I2: padded lane-aligned gates, dynamic xp read, full body
def kI2(xp_ref, u_ref, out_ref, h, c):
    h[:] = jnp.zeros_like(h); c[:] = jnp.zeros_like(c)
    u = u_ref[:]
    def body(t, _):
        z = xp_ref[pl.ds(t, 1), :] + jnp.dot(h[:], u, preferred_element_type=jnp.float32)
        i = jax.nn.sigmoid(z[:, 0:128]); f = jax.nn.sigmoid(z[:, 128:256])
        g = jnp.tanh(z[:, 256:384]); o = jax.nn.sigmoid(z[:, 384:512])
        cc = f * c[:] + i * g
        h[:] = o * jnp.tanh(cc); c[:] = cc
        return 0
    jax.lax.fori_loop(0, T, body, 0)
    out_ref[:] = h[:]
bench("I2: lane-aligned padded full body", mk(kI2, jax.ShapeDtypeStruct((1, 128), jnp.float32),
                                              [pltpu.VMEM((1, 128), jnp.float32)] * 2, xpad, Upad))
