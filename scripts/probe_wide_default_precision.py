"""Probe: precision=DEFAULT dots inside the batch-1 kernels at wide scale.

The package pins jax_default_matmul_precision=float32 (exactness), which
makes every f32 MXU dot a 3-pass bf16 emulation. The batched kernel work
(probe_batched_recurrence.py) showed an in-kernel escape hatch:
``precision=lax.Precision.DEFAULT`` lowers to a single bf16 pass with f32
accumulation. At the REFERENCE scale the batch-1 kernels are chain-bound
(381 ns/step dependency floor) so MXU passes shouldn't matter; at WIDE
scale (3x512) they are VMEM-weight-streaming-bound, and if the 3-pass
emulation re-streams weight tiles per pass, DEFAULT could cut batch-1
latency up to ~3x at bf16-roundoff accuracy.

Measures, batch-1 T=6656:
  * dense: XLA scan (best dense) / fused kernel, HIGHEST vs DEFAULT
  * reduced r=32 merged: hybrid path, HIGHEST vs DEFAULT
  * reference scale 4x40: fused kernel, HIGHEST vs DEFAULT (chain-bound
    control: expected ~no change)
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp

import svd_lstm_tpu.ops.pallas_lstm as PK
from svd_lstm_tpu.bench.devtime import device_time_ms
from svd_lstm_tpu.factor.svd import make_reduced_model, make_singular_model
from svd_lstm_tpu.models.lstm import init_stacked_lstm, stacked_lstm_apply

T = 6656
rng = np.random.default_rng(0)


def run(units, rank, d=16):
    x1 = jnp.asarray(rng.normal(size=(T, d)).astype(np.float32))
    params = init_stacked_lstm(jax.random.PRNGKey(0), d, units)
    rmodel = make_reduced_model(
        make_singular_model(params, merged_kernel=True), rank=rank
    )

    scan_fn = jax.jit(
        lambda p, xx: stacked_lstm_apply(p, xx[None], return_sequences=True)[0]
    )
    y_ref = np.asarray(scan_fn(params, x1))
    nrm = np.linalg.norm(y_ref)

    wide = max(units) > 128
    for prec in ("highest", "default"):
        # dot_precision is a first-class kernel parameter since the batch-1
        # fast mode landed (this probe originally monkeypatched _dot);
        # None = inherit the package's f32-forced default = exact
        dp = None if prec == "highest" else "default"
        if wide:
            full_fn = jax.jit(
                lambda p, xx, dp=dp: PK.dense_forward_hybrid(p, xx, dot_precision=dp)
            )
        else:
            full_fn = jax.jit(
                lambda p, xx, dp=dp: PK.fused_dense_stack_pallas(p, xx, dot_precision=dp)
            )
        red_fn = jax.jit(
            lambda p, xx, dp=dp: PK.reduced_forward_hybrid(p, xx, dot_precision=dp)
        )
        try:
            yf = np.asarray(full_fn(params, x1))
            tf = device_time_ms(full_fn, params, x1)
            ef = np.linalg.norm(yf - y_ref) / nrm
            yr = np.asarray(red_fn(rmodel, x1))
            tr = device_time_ms(red_fn, rmodel, x1)
            print(
                f"{'x'.join(map(str, units))} r={rank} prec={prec:8s}: "
                f"full(kernel) {tf:7.3f} ms (err {ef:.1e})   reduced(hybrid) {tr:7.3f} ms   "
                f"ratio {tr / tf:.3f}"
            )
        except Exception as e:
            print(f"{units} prec={prec}: FAILED {str(e)[:100]}")
    t_scan = device_time_ms(scan_fn, params, x1)
    print(f"  (XLA scan dense baseline: {t_scan:.3f} ms)")


if __name__ == "__main__":
    run((512, 512, 512), 32)
    run((40, 40, 40, 40), 25)
