"""On-chip A/B for the fully-fused wide-layer train kernel
(ops/pallas_train_wide.py) vs the round-3 split path (XLA xp matmul +
recurrence-only kernel). Correctness first, then device time.

Usage: probe_train_wide_fused.py [check|time|bt128]
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp
import optax

from svd_lstm_tpu.bench.devtime import device_time_ms
from svd_lstm_tpu.models.lstm import init_stacked_lstm, stacked_lstm_apply
from svd_lstm_tpu.ops.pallas_train import stacked_lstm_apply_fast_train


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


def check():
    """Compiled == f32 scan at bf16-class tolerance, small shapes first."""
    rng = np.random.default_rng(0)
    params = init_stacked_lstm(jax.random.PRNGKey(0), 16, (256, 256))
    x = jnp.asarray(rng.normal(size=(16, 12, 16)), jnp.float32)

    y_ref = np.asarray(
        jax.jit(lambda p, xx: stacked_lstm_apply(p, xx, return_sequences=True))(
            params, x
        )
    )
    y_new = np.asarray(
        jax.jit(lambda p, xx: stacked_lstm_apply_fast_train(p, xx))(params, x)
    )
    scale = np.abs(y_ref).max()
    log(f"fwd max|D| = {np.abs(y_new - y_ref).max():.2e} (scale {scale:.3f})")
    assert np.abs(y_new - y_ref).max() < 0.03 * scale

    def loss(apply_fn, p, xx):
        out = apply_fn(p, xx, return_sequences=False)[..., 0]
        return jnp.mean(out**2)

    g_new = jax.jit(jax.grad(lambda p: loss(stacked_lstm_apply_fast_train, p, x)))(
        params
    )
    g_ref = jax.jit(jax.grad(lambda p: loss(stacked_lstm_apply, p, x)))(params)
    for a, b in zip(jax.tree.leaves(g_new), jax.tree.leaves(g_ref)):
        a, b = np.asarray(a), np.asarray(b)
        d = np.abs(a - b).max()
        s = max(np.abs(b).max(), 1e-6)
        log(f"grad leaf {a.shape}: max|D| {d:.2e} rel {d/s:.3f}")
        assert d < 0.08 * max(s, 1e-3)
    log("CHECK OK")


def time_wide(bt_bwd=None):
    B, T, d = 128, 200, 16
    units = (512, 512, 512)
    rng = np.random.default_rng(1)
    params = init_stacked_lstm(jax.random.PRNGKey(1), d, units)
    opt = optax.adam(1e-3)
    s0 = opt.init(params)
    x = jnp.asarray(rng.normal(size=(B, T, d)), jnp.float32)
    y = jnp.asarray(rng.normal(size=(B,)), jnp.float32)

    if bt_bwd is not None:
        import svd_lstm_tpu.ops.pallas_train_wide as w

        w.DEFAULT_WIDE_BWD_BT = bt_bwd
        log(f"bt_bwd={bt_bwd}")

    new_step = mk_step(
        lambda p, xx, return_sequences: stacked_lstm_apply_fast_train(
            p, xx, return_sequences=return_sequences, wide_fused=True
        ),
        opt,
    )
    old_step = mk_step(
        lambda p, xx, return_sequences: stacked_lstm_apply_fast_train(
            p, xx, return_sequences=return_sequences, wide_fused=False
        ),
        opt,
    )
    # loss trajectory sanity: one step of each must agree
    p1, _, l1 = new_step(params, s0, x, y)
    p2, _, l2 = old_step(params, s0, x, y)
    dl = abs(float(l1) - float(l2))
    dp = max(
        float(jnp.abs(a - b).max())
        for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2))
    )
    log(f"one-step parity: |dloss|={dl:.2e}  max|dparam|={dp:.2e}")

    ms_new = device_time_ms(new_step, params, s0, x, y)
    ms_old = device_time_ms(old_step, params, s0, x, y)
    log(f"wide 3x512 B=128 T=200 full step: fused {ms_new:.3f} ms  "
        f"split(r3) {ms_old:.3f} ms  ({ms_old/ms_new:.2f}x)")


if __name__ == "__main__":
    log(f"devices: {jax.devices()}")
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "check"):
        check()
    if which in ("all", "time"):
        time_wide()
    if which == "bt128":
        time_wide(bt_bwd=128)
