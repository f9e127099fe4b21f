"""Probe: kernel-accelerated singular fine-tune at the reference scale.

The reference's central compression stage fine-tunes the factorized model
for 10 epochs (reference code/svd_acceleration_v3.py:119-128). Round 3
routes it through the fused dense training kernels via the differentiable
dense reconstruction (ops/singular_train.py). This measures the full
fine-tune step (value_and_grad incl. Hoyer + masked adam) at the flagship
4x40/B=512/T=200 and the driver-default 4x40/B=32 shapes against the XLA
scan baselines, plus gradient parity on the real shapes.
"""

import numpy as np
import jax
import jax.numpy as jnp

from svd_lstm_tpu.bench.devtime import device_time_ms
from svd_lstm_tpu.config import FactorConfig
from svd_lstm_tpu.factor.svd import make_singular_model
from svd_lstm_tpu.models.lstm import init_stacked_lstm
from svd_lstm_tpu.models.singular import singular_lstm_apply
from svd_lstm_tpu.ops.singular_train import singular_lstm_apply_fast_train
from svd_lstm_tpu.train.finetune import (
    make_finetune_optimizer,
    regularization_loss,
)

T, d = 200, 16
UNITS = (40, 40, 40, 40)


def main():
    rng = np.random.default_rng(0)
    dense = init_stacked_lstm(jax.random.PRNGKey(0), d, UNITS)
    fcfg = FactorConfig(hoyer=0.01)
    sparams = make_singular_model(dense, merged_kernel=fcfg.merged_kernel)
    opt = make_finetune_optimizer(sparams, fcfg)
    s0 = opt.init(sparams)

    def mk_loss(apply_fn):
        def loss(p, xx, yy):
            pred = apply_fn(p, xx, return_sequences=False)[..., 0]
            return jnp.mean((pred - yy) ** 2) + regularization_loss(p, fcfg)

        return loss

    loss_scan = mk_loss(singular_lstm_apply)
    loss_ker = mk_loss(singular_lstm_apply_fast_train)

    # guard-bypassing composition: singular_lstm_apply_fast_train routes
    # B > 128 to the scan fallback (the crash this probe documents), so the
    # kernel row at B=512 must call the kernel engine directly to stay a
    # crash repro rather than silently timing the fallback
    from svd_lstm_tpu.ops.pallas_train import stacked_lstm_apply_fast_train
    from svd_lstm_tpu.ops.singular_train import singular_dense_view

    def kernel_direct(p, x, return_sequences=True):
        return stacked_lstm_apply_fast_train(
            singular_dense_view(p), x, return_sequences=return_sequences
        )

    loss_ker_direct = mk_loss(kernel_direct)

    # gradient parity at the reference width (B=32 keeps the scan-autodiff
    # jit tractable through the tunnel; the fine CPU-side parity lives in
    # tests/test_singular_train_kernel.py)
    x = jnp.asarray(rng.normal(size=(32, T, d)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(32,)).astype(np.float32))
    gk = jax.jit(jax.grad(loss_ker))(sparams, x, y)
    gr = jax.jit(jax.grad(loss_scan))(sparams, x, y)
    rel = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max() / (jnp.abs(b).max() + 1e-12)),
        gk, gr,
    )
    print("grad rel errs:", [f"{e:.1e}" for e in jax.tree.leaves(rel)])

    import optax

    def mk_step(loss_fn, scope=None):
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

    for B in (32, 512):
        x = jnp.asarray(rng.normal(size=(B, T, d)).astype(np.float32))
        y = jnp.asarray(rng.normal(size=(B,)).astype(np.float32))
        print(f"-- B={B}")
        rows = [
            ("A f32 scan        ", mk_step(loss_scan)),
            ("B bf16 scan       ", mk_step(loss_scan, "bfloat16")),
            # C bypasses the B>128 guard: at B=512 this row is the crash
            # repro (expected FAILED: remote-compiler HTTP 500)
            ("C kernel (direct) ", mk_step(loss_ker_direct)),
        ]
        if B > 128:
            # what the public API actually runs at this B (the guard's
            # exact-scan fallback over the reconstructed view)
            rows.append(("D public API path ", mk_step(loss_ker)))
        for name, fn in rows:
            try:
                t = device_time_ms(fn, sparams, s0, x, y)
                print(f"{name}: {t:8.3f} ms/step")
            except Exception as e:
                print(f"{name}: FAILED {str(e)[:110]}")


if __name__ == "__main__":
    main()
