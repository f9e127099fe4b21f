"""Probe: does the B=512 singular fine-tune compiler crash extend past 512?

probe_finetune_b512_fix.py established: the fused-kernel fine-tune step
compiles and runs for B in {192..496}, crashes the remote compiler at
exactly B=512 (all five program restructurings identically), and the
SAME program with precomputed dense weights (no in-program
reconstruction) compiles fine at 512. This probe maps the region above:
B in {520, 576, 640, 768, 1024} — if any compile, padding B=512 upward
dodges the cliff; if none do, the fix is batch *chunking* (<=496 chunks).
"""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from svd_lstm_tpu.bench.devtime import device_time_ms
from svd_lstm_tpu.config import FactorConfig
from svd_lstm_tpu.factor.svd import make_singular_model
from svd_lstm_tpu.models.lstm import init_stacked_lstm
from svd_lstm_tpu.ops.pallas_train import stacked_lstm_apply_fast_train
from svd_lstm_tpu.ops.singular_train import singular_dense_view
from svd_lstm_tpu.train.finetune import make_finetune_optimizer, regularization_loss

T, d = 200, 16
UNITS = (40, 40, 40, 40)


def main():
    rng = np.random.default_rng(0)
    dense = init_stacked_lstm(jax.random.PRNGKey(0), d, UNITS)
    fcfg = FactorConfig(hoyer=0.01)
    sparams = make_singular_model(dense, merged_kernel=fcfg.merged_kernel)
    opt = make_finetune_optimizer(sparams, fcfg)
    s0 = opt.init(sparams)

    def loss(p, xx, yy):
        pred = stacked_lstm_apply_fast_train(
            singular_dense_view(p), xx, return_sequences=False
        )[..., 0]
        return jnp.mean((pred - yy) ** 2) + regularization_loss(p, fcfg)

    @jax.jit
    def step(p, s, xx, yy):
        l, g = jax.value_and_grad(loss)(p, xx, yy)
        u, s = opt.update(g, s, p)
        return optax.apply_updates(p, u), s, l

    for B in (520, 576, 640, 768, 1024):
        x = jnp.asarray(rng.normal(size=(B, T, d)).astype(np.float32))
        y = jnp.asarray(rng.normal(size=(B,)).astype(np.float32))
        try:
            t = device_time_ms(step, sparams, s0, x, y)
            print(f"B={B}: {t:8.3f} ms/step OK")
        except Exception as e:  # noqa: BLE001 — crash rows expected
            print(f"B={B}: FAILED {str(e)[:90]}")


if __name__ == "__main__":
    main()
