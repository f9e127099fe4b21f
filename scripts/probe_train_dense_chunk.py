"""Probe: 256-row batch chunking for the DENSE fused training kernel.

probe_finetune_b512_chunk.py showed 256-row chunks are the per-sample
optimum for the reconstruction-fed fine-tune (8.3 µs/sample vs 10.7 at
496) and that a chunk loop overlaps well. The dense trainer doesn't
crash at B=512 (5.42 ms whole-batch) — but if chunking transfers, the
B512 kernel row improves ~25%. Times whole-batch vs chunk sizes
{128, 256} at B in {512, 1024}, full adam step.
"""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from svd_lstm_tpu.bench.devtime import device_time_ms
from svd_lstm_tpu.models.lstm import init_stacked_lstm
from svd_lstm_tpu.ops.pallas_train import stacked_lstm_apply_fast_train

T, d = 200, 16
UNITS = (40, 40, 40, 40)


def mk_apply(chunk):
    def apply(p, x):
        B = x.shape[0]
        if chunk is None or B <= chunk:
            return stacked_lstm_apply_fast_train(p, x, return_sequences=False)
        k = -(-B // chunk)
        outs = [
            stacked_lstm_apply_fast_train(
                p, x[i * chunk : (i + 1) * chunk], return_sequences=False
            )
            for i in range(k)
        ]
        return jnp.concatenate(outs, 0)[:B]

    return apply


def main():
    rng = np.random.default_rng(0)
    params = init_stacked_lstm(jax.random.PRNGKey(0), d, UNITS)
    opt = optax.adam(1e-3)
    s0 = opt.init(params)

    def mk_step(apply):
        def loss(p, xx, yy):
            pred = apply(p, xx)[..., 0]
            return jnp.mean((pred - yy) ** 2)

        @jax.jit
        def step(p, s, xx, yy):
            l, g = jax.value_and_grad(loss)(p, xx, yy)
            u, s = opt.update(g, s, p)
            return optax.apply_updates(p, u), s, l

        return step

    for B in (512, 1024):
        x = jnp.asarray(rng.normal(size=(B, T, d)).astype(np.float32))
        y = jnp.asarray(rng.normal(size=(B,)).astype(np.float32))
        print(f"-- B={B}")
        for name, c in (("whole", None), ("c128", 128), ("c256", 256)):
            try:
                t = device_time_ms(mk_step(mk_apply(c)), params, s0, x, y)
                print(f"  {name:6s}: {t:8.3f} ms/step")
            except Exception as e:  # noqa: BLE001
                print(f"  {name:6s}: FAILED {str(e)[:90]}")


if __name__ == "__main__":
    main()
