"""Probe: fused whole-stack trainable kernel at the reference scale.

ops/pallas_train_fused.py runs all L narrow layers (n <= 128) in ONE
kernel per direction, weights + transposes + grad accumulators
VMEM-resident. This measures the full train step (value_and_grad + adam,
last-step MSE) at the flagship 4x40/B=512/T=200 configuration against the
XLA scan baselines, plus gradient parity.
"""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from svd_lstm_tpu.bench.devtime import device_time_ms
from svd_lstm_tpu.models.lstm import init_stacked_lstm, stacked_lstm_apply
from svd_lstm_tpu.ops.pallas_train_fused import fused_narrow_train_apply

B, T, d = 512, 200, 16
UNITS = (40, 40, 40, 40)


def main():
    rng = np.random.default_rng(0)
    params = init_stacked_lstm(jax.random.PRNGKey(0), d, UNITS)
    x = jnp.asarray(rng.normal(size=(B, T, d)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(B,)).astype(np.float32))

    # gradient parity on the real shapes (kernel vs autodiff scan)
    def loss_k(p, xx, yy):
        pred = fused_narrow_train_apply(p, xx, return_sequences=False)[..., 0]
        return jnp.mean((pred - yy) ** 2)

    def loss_r(p, xx, yy):
        pred = stacked_lstm_apply(p, xx, return_sequences=False)[..., 0]
        return jnp.mean((pred - yy) ** 2)

    gk = jax.jit(jax.grad(loss_k))(params, x, y)
    gr = jax.jit(jax.grad(loss_r))(params, x, y)
    rel = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max() / (jnp.abs(b).max() + 1e-12)),
        gk, gr,
    )
    print("grad rel errs:", [f"{e:.1e}" for e in jax.tree.leaves(rel)])

    opt = optax.adam(1e-3)
    s0 = opt.init(params)

    def mk(loss_fn, scope=None):
        @jax.jit
        def step(p, s, xx, yy):
            if scope:
                with jax.default_matmul_precision(scope):
                    l, g = jax.value_and_grad(loss_fn)(p, xx, yy)
            else:
                l, g = jax.value_and_grad(loss_fn)(p, xx, yy)
            u, s = opt.update(g, s, p)
            return optax.apply_updates(p, u), s, l

        return step

    for name, fn in [
        ("A f32 scan      ", mk(loss_r)),
        ("B bf16 scan     ", mk(loss_r, "bfloat16")),
        ("C fused kernels ", mk(loss_k)),
    ]:
        try:
            t = device_time_ms(fn, params, s0, x, y)
            print(f"{name}: {t:8.3f} ms/step")
        except Exception as e:
            print(f"{name}: FAILED {str(e)[:110]}")


if __name__ == "__main__":
    main()
