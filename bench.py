"""Headline benchmark: whole-run batch-1 inference, full vs SVD-reduced.

Protocol parity with the reference (time the whole-run predict, full vs
reduced — code/svd_acceleration_v3.py:147-152, plots/timing_plot.png):
a 4×40-unit stacked LSTM over the DROPBEAR-length run (T = 6656 frames of
16 samples), truncated at keep-rank r=25 per gate (the published sweet spot
k = 15, slide 13, at this width).

The reference's Python/Keras reduced model ran 1.31× SLOWER than its full
model; ours runs at parity or better via the TPU kernel layout (factored
x-side projections + dense-reconstructed recurrence — see
svd_lstm_tpu/ops/layouts.py). ``vs_baseline`` is the improvement over that
1.31× baseline ratio (>1 means better than the reference).

Timing is on-device execution time via the JAX profiler
(svd_lstm_tpu/bench/devtime.py) — wall clock through a tunneled TPU backend
measures dispatch, not compute.

Prints ONE JSON line on stdout; diagnostics go to stderr.
"""

import json
import sys

import numpy as np

import os

REFERENCE_RATIO = 1.31  # timing(reduced)/timing(full), reference slide 15

# Overridable for CI smoke runs (BENCH_T=512 BENCH_UNITS=40,40 python bench.py)
T = int(os.environ.get("BENCH_T", 6656))
UNITS = tuple(int(u) for u in os.environ.get("BENCH_UNITS", "40,40,40,40").split(","))
INPUT_DIM = 16
RANK = int(os.environ.get("BENCH_RANK", 25))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    import svd_lstm_tpu as st
    from svd_lstm_tpu.bench.devtime import device_time_ms
    from svd_lstm_tpu.models.lstm import init_stacked_lstm, stacked_lstm_apply
    from svd_lstm_tpu.ops.layouts import reduced_forward_fused
    from svd_lstm_tpu.ops.pallas_lstm import fused_dense_stack_pallas

    log(f"devices: {jax.devices()}")
    on_tpu = jax.devices()[0].platform != "cpu"

    rng = np.random.default_rng(0)
    x1 = jnp.asarray(rng.normal(size=(T, INPUT_DIM)), jnp.float32)
    x = x1[None]

    params = init_stacked_lstm(jax.random.PRNGKey(0), INPUT_DIM, UNITS)
    smodel = st.make_singular_model(params, merged_kernel=False)
    rmodel = st.make_reduced_model(smodel, rank=RANK)

    scan_full = jax.jit(lambda p, xx: stacked_lstm_apply(p, xx, return_sequences=True))
    if on_tpu:
        # fused compact-weight Pallas kernels (fastest measured batch-1 path)
        full_fn = jax.jit(fused_dense_stack_pallas)
        red_fn = jax.jit(reduced_forward_fused)
    else:
        from svd_lstm_tpu.ops.layouts import reduced_forward_dense_recurrent

        full_fn = jax.jit(lambda p, xx: scan_full(p, xx[None])[0])
        red_fn = jax.jit(
            lambda p, xx: reduced_forward_dense_recurrent(p, xx[None], return_sequences=True)[0]
        )

    # correctness gates: the execution layouts must reproduce the scan
    # semantics exactly (full vs fused, and reduced layout vs two-step scan)
    from svd_lstm_tpu.models.reduced import reduced_lstm_apply

    full_err = float(jnp.abs(full_fn(params, x1) - scan_full(params, x)[0]).max())
    red_err = float(
        jnp.abs(
            red_fn(rmodel, x1)
            - jax.jit(lambda p, xx: reduced_lstm_apply(p, xx, return_sequences=True))(rmodel, x)[0]
        ).max()
    )
    log(f"layout exactness: full {full_err:.3e}  reduced {red_err:.3e}")
    assert full_err < 5e-4 and red_err < 5e-4, "kernel layout changed the math"

    full_ms = device_time_ms(full_fn, params, x1, repeats=3)
    red_ms = device_time_ms(red_fn, rmodel, x1, repeats=3)
    ratio = red_ms / full_ms

    full_w = sum(int(np.asarray(l).size) for layer in params.layers for l in layer)
    red_w = sum(l.weight_count() for l in rmodel.layers)

    log(f"full:    {full_ms:8.3f} ms  ({full_ms*1e3/T:7.3f} us/step)")
    log(f"reduced: {red_ms:8.3f} ms  ({red_ms*1e3/T:7.3f} us/step)  rank={RANK}")
    log(f"ratio reduced/full: {ratio:.3f}  (reference: {REFERENCE_RATIO})")
    log(f"weights: full {full_w} -> reduced {red_w} ({100-100*red_w/full_w:.1f}% smaller)")

    print(
        json.dumps(
            {
                "metric": "whole_run_latency_ratio_reduced_over_full",
                "value": round(ratio, 4),
                "unit": f"ratio (batch-1, T={T}, 4x40 LSTM, r={RANK}; device-time)",
                "vs_baseline": round(REFERENCE_RATIO / ratio, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
