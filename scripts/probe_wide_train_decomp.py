"""Probe: where the 13.1 ms wide train step goes (3x512/B=128/T=200).

The isolated recurrence kernel pair costs 1.55 ms/layer (probe_train_bwd)
= 4.65 ms for three layers; the train step measures 13.1. This probe
decomposes the remainder: marginal per-layer cost, forward-only vs full
step, the xp-projection share, and the adam share — to see whether the
gap is in XLA glue we can shave or in unavoidable HBM residual traffic
(h/c sequences are (T,B,n) streams the backward must re-read).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_wide_train_decomp.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from svd_lstm_tpu.bench.devtime import device_time_ms
from svd_lstm_tpu.models.lstm import init_stacked_lstm, stacked_lstm_apply
from svd_lstm_tpu.ops.pallas_train import stacked_lstm_apply_fast_train

B, T, d = 128, 200, 16
N = 512


def main():
    assert jax.devices()[0].platform != "cpu"
    rng = np.random.default_rng(0)
    opt = optax.adam(1e-3)

    def mk(apply_fn, params):
        def loss(p, xx, yy):
            pred = apply_fn(p, xx, return_sequences=False)[..., 0]
            return jnp.mean((pred - yy) ** 2)

        s0 = opt.init(params)

        @jax.jit
        def step(p, s, xx, yy):
            l, g = jax.value_and_grad(loss)(p, xx, yy)
            u, s = opt.update(g, s, p)
            return optax.apply_updates(p, u), s, l

        @jax.jit
        def fwd_only(p, xx, yy):
            return loss(p, xx, yy)

        return step, fwd_only, s0

    x = jnp.asarray(rng.normal(size=(B, T, d)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(B,)).astype(np.float32))

    for L in (1, 2, 3):
        params = init_stacked_lstm(jax.random.PRNGKey(0), d, (N,) * L)
        step, fwd_only, s0 = mk(stacked_lstm_apply_fast_train, params)
        t_step = device_time_ms(step, params, s0, x, y)
        t_fwd = device_time_ms(fwd_only, params, x, y)
        print(f"L={L}: full step {t_step:7.3f} ms | fwd-only {t_fwd:7.3f} ms")

    # baselines at L=3
    params = init_stacked_lstm(jax.random.PRNGKey(0), d, (N,) * 3)
    step_f32, _, s0 = mk(stacked_lstm_apply, params)

    def mk_scope(scope):
        def loss(p, xx, yy):
            with jax.default_matmul_precision(scope):
                pred = stacked_lstm_apply(p, xx, return_sequences=False)[..., 0]
                return jnp.mean((pred - yy) ** 2)

        @jax.jit
        def step(p, s, xx, yy):
            l, g = jax.value_and_grad(loss)(p, xx, yy)
            u, s = opt.update(g, s, p)
            return optax.apply_updates(p, u), s, l

        return step

    print(f"L=3 f32 scan step : {device_time_ms(step_f32, params, s0, x, y):7.3f} ms")
    print(f"L=3 bf16 scan step: {device_time_ms(mk_scope('bfloat16'), params, s0, x, y):7.3f} ms")


if __name__ == "__main__":
    main()
