"""Probe: close the gap between the wide-model hybrid reduced path and its
floor model.

The chain+streaming floor model (probe_chain_decomposition) puts the
merged two-step recurrence at 3x512/r=32 near ~330 ns/layer-step
(2 chain stages + 524 KiB streamed); the measured hybrid whole-run is
1.48 us/step over 3 layers — ~50% above the floor. Candidates measured
here, batch-1 T=6656:

  * CT (time-chunk) sweep for the recurrence kernel: bigger chunks mean
    fewer grid iterations and larger double-buffered xp blocks.
  * unroll sweep at the wide scale (16 was tuned at 4x40).
  * fused whole-stack reduced kernel (in-kernel x-side) vs the hybrid.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_wide_hybrid_tuning.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import functools

import jax
import jax.numpy as jnp

from svd_lstm_tpu.factor.svd import make_reduced_model, make_singular_model
from svd_lstm_tpu.models.lstm import init_stacked_lstm, stacked_lstm_apply
from svd_lstm_tpu.models.reduced import reduced_projection
from svd_lstm_tpu.ops.pallas_lstm import (
    fused_reduced_stack_pallas,
    reduced_recurrence_pallas,
)

UNITS = (512, 512, 512)
RANK = 32
T = 6656


def hybrid_fn(ct, unroll):
    def f(params, x):
        h = x
        for l in params.layers:
            xp = reduced_projection(l, h, "w") + l.b
            uB = tuple(l.uB) if l.split else l.uB
            uC = tuple(l.uC) if l.split else l.uC
            h = reduced_recurrence_pallas(xp, uB, uC, ct=ct, unroll=unroll)
        return h @ params.head.w + params.head.b

    return jax.jit(f)


def main():
    assert jax.devices()[0].platform != "cpu", "timing probe needs the TPU"
    from svd_lstm_tpu.bench.devtime import device_time_ms

    params = init_stacked_lstm(jax.random.PRNGKey(1), 16, UNITS)
    rmodel = make_reduced_model(make_singular_model(params, merged_kernel=True), rank=RANK)
    x = jax.random.normal(jax.random.PRNGKey(2), (T, 16))

    dense_fn = jax.jit(
        lambda p, xx: stacked_lstm_apply(p, xx[None], return_sequences=True)[0]
    )
    t_dense = device_time_ms(dense_fn, params, x, repeats=2)
    print(f"dense scan: {t_dense:.3f} ms")

    base = hybrid_fn(512, 16)
    ref = base(rmodel, x)
    t_base = device_time_ms(base, rmodel, x, repeats=2)
    print(f"hybrid ct=512 unroll=16 (bench default): {t_base:.3f} ms "
          f"ratio {t_base / t_dense:.3f}")

    # ct=2048 makes the double-buffered xp block (ct, 4*512) exceed the
    # 16 MB VMEM scoped limit — measured compile OOM; 1024 measured SLOWER
    # than the 512 default (10.55 vs 9.83 ms), so 512 stays the default.
    for ct in (1024,):
        for unroll in (16, 32):
            fn = hybrid_fn(ct, unroll)
            err = float(jnp.abs(fn(rmodel, x) - ref).max())
            t = device_time_ms(fn, rmodel, x, repeats=2)
            print(f"hybrid ct={ct} unroll={unroll}: {t:.3f} ms "
                  f"ratio {t / t_dense:.3f} err {err:.1e}")

    fr = jax.jit(functools.partial(fused_reduced_stack_pallas, rmodel))
    err = float(jnp.abs(fr(x) - ref).max())
    t_fr = device_time_ms(fr, x, repeats=2)
    print(f"fused whole-stack reduced: {t_fr:.3f} ms ratio {t_fr / t_dense:.3f} "
          f"err {err:.1e}")


if __name__ == "__main__":
    main()
