"""Decompose the fused-kernel train step device time (VERDICT r3 next #3).

Questions this probe answers, on the real chip:

* wide (3x512, B=128, T=200, measured 13.15 ms full step): where does the
  time go — forward kernels, backward kernels, hoisted xp matmuls, adam?
* narrow (4x40, B=512 -> 2x256 chunks, measured 4.30 ms): same split.

Each timing is profiler device time (bench/devtime). Components are timed
as standalone jitted programs, so sums can exceed the fused whole because
XLA overlaps in the full program — the point is the *ratio* structure.
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp
import optax

from svd_lstm_tpu.bench.devtime import device_time_ms
from svd_lstm_tpu.models.lstm import init_stacked_lstm, stacked_lstm_apply
from svd_lstm_tpu.ops.pallas_train import (
    lstm_recurrence_trainable,
    stacked_lstm_apply_fast_train,
)

DEF = jax.lax.Precision.DEFAULT


def log(*a):
    print(*a, flush=True)


def mk_step(apply_fn, opt):
    def loss_fn(p, xx, yy):
        pred = apply_fn(p, xx, return_sequences=False)[..., 0]
        return jnp.mean((pred - yy) ** 2)

    @jax.jit
    def step(p, s, xx, yy):
        l, g = jax.value_and_grad(loss_fn)(p, xx, yy)
        u, s = opt.update(g, s, p)
        return optax.apply_updates(p, u), s, l

    return step


def probe_wide():
    B, T, d = 128, 200, 16
    units = (512, 512, 512)
    n = units[0]
    rng = np.random.default_rng(0)
    params = init_stacked_lstm(jax.random.PRNGKey(0), d, units)
    opt = optax.adam(1e-3)
    s0 = opt.init(params)
    x = jnp.asarray(rng.normal(size=(B, T, d)), jnp.float32)
    y = jnp.asarray(rng.normal(size=(B,)), jnp.float32)

    apply_k = lambda p, xx, return_sequences: stacked_lstm_apply_fast_train(  # noqa: E731
        p, xx, return_sequences=return_sequences
    )
    log("== wide 3x512 B=128 T=200 ==")
    full = device_time_ms(mk_step(apply_k, opt), params, s0, x, y)
    log(f"full step (kernel):            {full:8.3f} ms")

    # forward only
    fwd_fn = jax.jit(lambda p, xx: apply_k(p, xx, False))
    fms = device_time_ms(fwd_fn, params, x)
    log(f"forward only (kernel):         {fms:8.3f} ms")

    # value_and_grad, no optimizer
    def loss_fn(p, xx, yy):
        pred = apply_k(p, xx, False)[..., 0]
        return jnp.mean((pred - yy) ** 2)

    vg = jax.jit(lambda p, xx, yy: jax.value_and_grad(loss_fn)(p, xx, yy))
    vgms = device_time_ms(vg, params, x, y)
    log(f"value_and_grad (no adam):      {vgms:8.3f} ms")

    # adam update alone
    g0 = vg(params, x, y)[1]

    @jax.jit
    def adam_only(p, s, g):
        u, s = opt.update(g, s, p)
        return optax.apply_updates(p, u), s

    ams = device_time_ms(adam_only, params, s0, g0)
    log(f"adam update alone:             {ams:8.3f} ms")

    # hoisted xp matmuls alone (3 layers fwd): h @ W + b over (T*B, n)
    h = jnp.asarray(rng.normal(size=(T, B, n)), jnp.float32)
    Ws = jnp.stack([l.W for l in params.layers[1:]] + [params.layers[1].W])

    @jax.jit
    def xp_fwd(h, Ws):
        out = 0.0
        for i in range(3):
            out = out + jnp.dot(h, Ws[i], precision=DEF)
        return out

    xms = device_time_ms(xp_fwd, h, Ws)
    log(f"3x xp matmul fwd (T*B,n)@(n,4n): {xms:6.3f} ms")

    # single-layer recurrence kernel: fwd only, then fwd+bwd
    xp = jnp.asarray(rng.normal(size=(T, B, 4 * n)), jnp.float32)
    U = params.layers[1].U
    one_fwd = jax.jit(lambda xp, U: lstm_recurrence_trainable(xp, U))
    oms = device_time_ms(one_fwd, xp, U)
    log(f"1-layer pallas fwd:            {oms:8.3f} ms")

    one_vg = jax.jit(
        jax.grad(lambda xp, U: jnp.sum(lstm_recurrence_trainable(xp, U)), argnums=(0, 1))
    )
    ovg = device_time_ms(one_vg, xp, U)
    log(f"1-layer pallas fwd+bwd:        {ovg:8.3f} ms")

    # reference: bf16 scan full step
    scan_step = mk_step(
        lambda p, xx, return_sequences: stacked_lstm_apply(
            p, xx, return_sequences=return_sequences
        ),
        opt,
    )
    # (f32; the bf16 scope variant is in bench.py — here we just anchor)
    sms = device_time_ms(scan_step, params, s0, x, y)
    log(f"full step (f32 XLA scan):      {sms:8.3f} ms")


def probe_narrow():
    d, units, T = 16, (40, 40, 40, 40), 200
    rng = np.random.default_rng(1)
    params = init_stacked_lstm(jax.random.PRNGKey(1), d, units)
    opt = optax.adam(1e-3)
    s0 = opt.init(params)
    apply_k = lambda p, xx, return_sequences: stacked_lstm_apply_fast_train(  # noqa: E731
        p, xx, return_sequences=return_sequences
    )
    for B in (256, 512):
        x = jnp.asarray(rng.normal(size=(B, T, d)), jnp.float32)
        y = jnp.asarray(rng.normal(size=(B,)), jnp.float32)
        log(f"== narrow 4x40 B={B} T={T} ==")
        full = device_time_ms(mk_step(apply_k, opt), params, s0, x, y)
        log(f"full step (kernel):            {full:8.3f} ms")
        fwd_fn = jax.jit(lambda p, xx: apply_k(p, xx, False))
        fms = device_time_ms(fwd_fn, params, x)
        log(f"forward only (kernel):         {fms:8.3f} ms")

        def loss_fn(p, xx, yy):
            pred = apply_k(p, xx, False)[..., 0]
            return jnp.mean((pred - yy) ** 2)

        vg = jax.jit(lambda p, xx, yy: jax.value_and_grad(loss_fn)(p, xx, yy))
        vgms = device_time_ms(vg, params, x, y)
        log(f"value_and_grad (no adam):      {vgms:8.3f} ms")


if __name__ == "__main__":
    log(f"devices: {jax.devices()}")
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "wide"):
        probe_wide()
    if which in ("all", "narrow"):
        probe_narrow()
