"""On-chip A/B: compact gate layout vs P-layout for the fused narrow
TRAIN kernels (follow-up to the c911c28 pre-wiring).

At n=40 the P-layout pads every gate to a 128-lane block — 3.2x the MXU
lanes and VPU transcendentals are padding (train MFU 0.034 at B=512).
The compact layout packs k gates per block. Batch-1 inference measured
compact 0.8x (latency-bound chain); batched training is compute-bound,
where compact should pay up to ~k x. This probe decides whether to wire
compact into the training dispatch: full train step (value_and_grad +
adam, last-step MSE) at 4x40/T=200 across batch sizes, plus on-chip
gradient parity vs the f32 scan.
"""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from functools import partial

from svd_lstm_tpu.bench.devtime import device_time_ms
from svd_lstm_tpu.models.lstm import init_stacked_lstm, stacked_lstm_apply
from svd_lstm_tpu.ops.pallas_train import stacked_lstm_apply_fast_train
from svd_lstm_tpu.ops.pallas_train_compact import (
    compact_eligible,
    fused_narrow_train_apply_compact,
)

T, d = 200, 16
UNITS = (40, 40, 40, 40)


def mk_loss(apply_fn):
    def loss(p, xx, yy):
        pred = apply_fn(p, xx, return_sequences=False)[..., 0]
        return jnp.mean((pred - yy) ** 2)

    return loss


def mk_step(loss_fn, opt):
    @jax.jit
    def step(p, s, xx, yy):
        l, g = jax.value_and_grad(loss_fn)(p, xx, yy)
        u, s = opt.update(g, s, p)
        return optax.apply_updates(p, u), s, l

    return step


def main():
    rng = np.random.default_rng(0)
    params = init_stacked_lstm(jax.random.PRNGKey(0), d, UNITS)
    print("compact_eligible:", compact_eligible(params, d), flush=True)

    # on-chip gradient parity at a real batch (compiled Mosaic, not
    # interpret — the bug class the tpu suite exists for)
    x = jnp.asarray(rng.normal(size=(128, T, d)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(128,)).astype(np.float32))
    gc = jax.jit(jax.grad(mk_loss(fused_narrow_train_apply_compact)))(params, x, y)
    gr = jax.jit(jax.grad(mk_loss(stacked_lstm_apply)))(params, x, y)
    rels = jax.tree.leaves(
        jax.tree.map(
            lambda a, b: float(jnp.abs(a - b).max() / (jnp.abs(b).max() + 1e-12)),
            gc, gr,
        )
    )
    print(f"compact grad rel errs (max {max(rels):.2e}):",
          [f"{e:.1e}" for e in rels], flush=True)

    opt = optax.adam(1e-3)
    s0 = opt.init(params)
    # measure THROUGH the production dispatch (ADVICE r4): at B=512 it
    # splits into 2x256 balanced chunks (> _MAX_WHOLE_BATCH=496) — timing
    # the whole-batch kernels directly would compare programs the
    # dispatch never runs
    step_p = mk_step(
        mk_loss(partial(stacked_lstm_apply_fast_train, compact=False)), opt
    )
    step_c = mk_step(
        mk_loss(partial(stacked_lstm_apply_fast_train, compact=True)), opt
    )

    for B in (32, 128, 512):
        xb = jnp.asarray(rng.normal(size=(B, T, d)).astype(np.float32))
        yb = jnp.asarray(rng.normal(size=(B,)).astype(np.float32))
        row = [f"B={B:4d}"]
        for name, fn in (("P-layout", step_p), ("compact", step_c)):
            try:
                t = device_time_ms(fn, params, s0, xb, yb)
                row.append(f"{name} {t:7.3f} ms")
            except Exception as e:  # noqa: BLE001
                row.append(f"{name} FAILED {str(e)[:80]}")
        print("  ".join(row), flush=True)


if __name__ == "__main__":
    main()
