"""Probe: Pallas forward recurrence inside the training step (custom_vjp).

BENCH_NOTES training table: 3x512/B=128/T=200 value_and_grad+adam step is
41.3 ms f32 / 19.8 ms bf16 — the recurrence scans re-stream U from HBM
every step in BOTH directions. This probe measures a custom_vjp
recurrence: forward = the VMEM-resident Pallas kernel (also emitting c_seq
for the backward), backward = XLA reverse scan that recomputes the gates
from (xp, h_seq, c_seq) — one extra dot per step, standard remat trade.

Measured variants (device time per train step, adam, MSE on last step):
  A. XLA scan fwd+bwd, f32 (package default)
  B. XLA scan fwd+bwd, bfloat16 matmul scope (current fast training)
  C. custom_vjp (ops/pallas_train.py): Pallas fwd + Pallas bwd
  D. scan with explicit DEFAULT dots (isolates the precision effect)
  E. the probe-local Pallas-fwd + XLA-bwd variant (history: measured
     25.2 ms — the XLA backward's weight re-streaming ate the fwd gain,
     which is why C's backward is also a kernel; probe_train_bwd.py)
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import optax

from svd_lstm_tpu.bench.devtime import device_time_ms
from svd_lstm_tpu.models.lstm import (
    gate_update,
    init_stacked_lstm,
    stacked_lstm_apply,
)
from svd_lstm_tpu.ops.pallas_batched import batched_lstm_recurrence_pallas

B, T, d = 128, 200, 16
UNITS = (512, 512, 512)
DEF = jax.lax.Precision.DEFAULT


# ---------------------------------------------------------------------------
# custom_vjp recurrence: pallas fwd (h_seq, c_seq), XLA reverse-scan bwd
# ---------------------------------------------------------------------------

def _fwd_scan(xp, U):
    """Reference forward (XLA scan), returns (h_seq, c_seq): (T, B, n)."""
    Tt, Bb, g4 = xp.shape
    n = U.shape[0]
    h0 = jnp.zeros((Bb, n), jnp.float32)
    c0 = jnp.zeros((Bb, n), jnp.float32)

    def step(carry, xp_t):
        h, c = carry
        z = xp_t + jnp.dot(h, U, precision=DEF)
        h, c = gate_update(z, c)
        return (h, c), (h, c)

    _, (h_seq, c_seq) = jax.lax.scan(step, (h0, c0), xp)
    return h_seq, c_seq


@jax.custom_vjp
def recurrence(xp, U):
    return _fwd_scan(xp, U)[0]


def _recurrence_fwd_pallas(xp, U):
    h_seq, c_seq = pallas_fwd(xp, U)
    return h_seq, (xp, U, h_seq, c_seq)


def _recurrence_bwd(res, dh_seq):
    xp, U, h_seq, c_seq = res
    Tt, Bb, g4 = xp.shape
    n = U.shape[0]
    # shift: h_prev[t] = h_seq[t-1] (zeros at t=0); c_prev likewise
    zeros = jnp.zeros((1, Bb, n), jnp.float32)
    h_prev = jnp.concatenate([zeros, h_seq[:-1]], axis=0)
    c_prev = jnp.concatenate([zeros, c_seq[:-1]], axis=0)
    Ut = U.T

    def step(carry, inp):
        dh_carry, dc = carry
        dh_out, xp_t, hp, cp, ct = inp
        dh = dh_out + dh_carry
        # recompute gates (one dot — remat)
        z = xp_t + jnp.dot(hp, U, precision=DEF)
        zi, zf, zg, zo = jnp.split(z, 4, axis=-1)
        i = jax.nn.sigmoid(zi)
        f = jax.nn.sigmoid(zf)
        g = jnp.tanh(zg)
        o = jax.nn.sigmoid(zo)
        tc = jnp.tanh(ct)
        dc_tot = dc + dh * o * (1.0 - tc * tc)
        dzo = dh * tc * o * (1.0 - o)
        dzi = dc_tot * g * i * (1.0 - i)
        dzf = dc_tot * cp * f * (1.0 - f)
        dzg = dc_tot * i * (1.0 - g * g)
        dz = jnp.concatenate([dzi, dzf, dzg, dzo], axis=-1)
        dh_prev = jnp.dot(dz, Ut, precision=DEF)
        dU_t = jnp.dot(hp.T, dz, precision=DEF)
        dc_prev = dc_tot * f
        return (dh_prev, dc_prev), (dz, dU_t)

    init = (jnp.zeros((Bb, n), jnp.float32), jnp.zeros((Bb, n), jnp.float32))
    (_, _), (dxp, dU_t) = jax.lax.scan(
        step, init, (dh_seq, xp, h_prev, c_prev, c_seq), reverse=True
    )
    return dxp, jnp.sum(dU_t, axis=0)


# Pallas forward emitting both h_seq and c_seq
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pallas_fwd(xp, U, bt: int = 512, interpret: bool = False):
    Tt, Bb, g4 = xp.shape
    n = U.shape[0]
    assert n % 128 == 0 and g4 == 4 * n
    assert Bb % 8 == 0, "probe kernel: B must be sublane-aligned"
    BT = min(bt, Bb)  # tile must not exceed B (no padding in this probe)
    assert Bb % BT == 0
    nbt = Bb // BT

    def kernel(xp_ref, u_ref, h_out, c_out, h_scr, c_scr):
        @pl.when(pl.program_id(1) == 0)
        def _():
            h_scr[:] = jnp.zeros_like(h_scr)
            c_scr[:] = jnp.zeros_like(c_scr)

        z = (
            jnp.dot(h_scr[:], u_ref[:], preferred_element_type=jnp.float32,
                    precision=DEF)
            + xp_ref[:]
        )
        h, c = gate_update(z, c_scr[:])
        h_scr[:] = h
        c_scr[:] = c
        h_out[:] = h
        c_out[:] = c

    h2, c2 = pl.pallas_call(
        kernel,
        grid=(nbt, Tt),
        in_specs=[
            pl.BlockSpec((BT, g4), lambda i, t: (t * nbt + i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((BT, n), lambda i, t: (t * nbt + i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BT, n), lambda i, t: (t * nbt + i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Tt * Bb, n), jnp.float32),
            jax.ShapeDtypeStruct((Tt * Bb, n), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((BT, n), jnp.float32)] * 2,
        interpret=interpret,
    )(xp.reshape(Tt * Bb, g4), U)
    return h2.reshape(Tt, Bb, n), c2.reshape(Tt, Bb, n)


recurrence.defvjp(_recurrence_fwd_pallas, _recurrence_bwd)


def forward(params, x, use_kernel: bool):
    """Stacked forward, last-step head output (training semantics)."""
    h = jnp.swapaxes(x, 0, 1)  # (T, B, d)
    for layer in params.layers:
        xp = jnp.dot(h, layer.W, precision=DEF) + layer.b
        if use_kernel:
            h = recurrence(xp, layer.U)
        else:
            h = _fwd_scan(xp, layer.U)[0]
    return h[-1] @ params.head.w + params.head.b


def make_step(params, use_kernel, scope=None):
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    def loss_fn(p, x, y):
        pred = forward(p, x, use_kernel)[..., 0]
        return jnp.mean((pred - y) ** 2)

    @jax.jit
    def step(p, s, x, y):
        if scope:
            with scope:
                loss, grads = jax.value_and_grad(loss_fn)(p, x, y)
        else:
            loss, grads = jax.value_and_grad(loss_fn)(p, x, y)
        updates, s = opt.update(grads, s, p)
        return optax.apply_updates(p, updates), s, loss

    return step, opt_state


def main():
    rng = np.random.default_rng(0)
    params = init_stacked_lstm(jax.random.PRNGKey(0), d, UNITS)
    x = jnp.asarray(rng.normal(size=(B, T, d)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(B,)).astype(np.float32))

    # gradient correctness: kernel-vjp vs pure autodiff on small shapes
    sp = init_stacked_lstm(jax.random.PRNGKey(1), 4, (128,))
    xs = jnp.asarray(rng.normal(size=(8, 6, 4)).astype(np.float32))
    ys = jnp.asarray(rng.normal(size=(8,)).astype(np.float32))
    g1 = jax.grad(lambda p: jnp.mean((forward(p, xs, False)[..., 0] - ys) ** 2))(sp)
    g2 = jax.grad(lambda p: jnp.mean((forward(p, xs, True)[..., 0] - ys) ** 2))(sp)
    errs = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), g1, g2)
    print("grad max errs:", jax.tree.leaves(errs))

    import contextlib

    # A: plain f32 scan (package default precision) via stacked_lstm_apply
    def loss_a(p, xx, yy):
        pred = stacked_lstm_apply(p, xx, return_sequences=False)[..., 0]
        return jnp.mean((pred - yy) ** 2)

    opt = optax.adam(1e-3)
    s0 = opt.init(params)

    @jax.jit
    def step_a(p, s, xx, yy):
        loss, grads = jax.value_and_grad(loss_a)(p, xx, yy)
        u, s = opt.update(grads, s, p)
        return optax.apply_updates(p, u), s, loss

    @jax.jit
    def step_b(p, s, xx, yy):
        with jax.default_matmul_precision("bfloat16"):
            loss, grads = jax.value_and_grad(loss_a)(p, xx, yy)
        u, s = opt.update(grads, s, p)
        return optax.apply_updates(p, u), s, loss

    from svd_lstm_tpu.ops.pallas_train import stacked_lstm_apply_fast_train

    def loss_c(p, xx, yy):
        pred = stacked_lstm_apply_fast_train(p, xx, return_sequences=False)[..., 0]
        return jnp.mean((pred - yy) ** 2)

    @jax.jit
    def step_c(p, s, xx, yy):
        loss, grads = jax.value_and_grad(loss_c)(p, xx, yy)
        u, s = opt.update(grads, s, p)
        return optax.apply_updates(p, u), s, loss

    step_d, _ = make_step(params, use_kernel=False)
    step_e, _ = make_step(params, use_kernel=True)

    for name, fn in [("A f32 scan", step_a), ("B bf16-scope scan", step_b),
                     ("C pallas fwd+bwd", step_c), ("D scan DEFAULT dots", step_d),
                     ("E pallas-fwd xla-bwd", step_e)]:
        try:
            t = device_time_ms(lambda p, s, xx, yy: fn(p, s, xx, yy), params, s0, x, y)
            print(f"{name:22s}: {t:8.3f} ms/step")
        except Exception as e:
            print(f"{name:22s}: FAILED {str(e)[:120]}")


if __name__ == "__main__":
    main()
