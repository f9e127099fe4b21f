"""Conv-hybrid TPU timing: does the compressed hybrid behave like the
pure-LSTM family once the conv front end is hoisted?

The round-3 conv-hybrid work (models/conv.py, factor/svd.py conv surgery)
was CPU-verified while the axon tunnel was wedged; BENCH_NOTES predicted
from the chain analysis that the hybrid's timing is the inner stack's
timing plus one negligible whole-sequence conv. This probe measures that
claim on the real chip:

* reference hybrid scale — Conv1D(15, k=10, causal, relu) + 2x15 LSTM
  (code/old_versions/toy-convolution.py:70-76), batch-1, T=6656:
  dense vs rank-8 reduced, exact and fast, plus the conv front end alone.
* wide hybrid — Conv1D(64, k=10) + 3x512 merged r=32 (the operating point
  where rank reduction pays): dense vs reduced, exact and fast.

Run on TPU:  python scripts/probe_conv_hybrid_timing.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

T = 6656


def measure(tag, fn, *args, ref=None):
    import jax

    from svd_lstm_tpu.bench.devtime import device_time_ms

    jfn = jax.jit(fn)
    ms = device_time_ms(jfn, *args, repeats=3)
    note = f"  ratio {ms / ref:.4f}" if ref else ""
    print(f"  {tag:<34s} {ms:8.3f} ms{note}")
    return ms


def main():
    import jax
    import jax.numpy as jnp

    import svd_lstm_tpu as st
    from svd_lstm_tpu.factor.svd import make_conv_reduced_model, make_conv_singular_model
    from svd_lstm_tpu.models.conv import causal_conv1d, init_conv_lstm

    print(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)
    x1 = jnp.asarray(rng.normal(size=(T, 16)), jnp.float32)

    def pred(precision):
        return lambda p, xx: st.predict(p, xx, precision=precision)

    # -- reference hybrid scale: Conv(15, k=10) + 2x15 ---------------------
    print("\n[reference hybrid scale] Conv1D(15,k=10)+2x15, batch-1, T=6656")
    hyb = init_conv_lstm(jax.random.PRNGKey(0), in_channels=16, filters=15,
                         kernel_size=10, units=(15, 15))
    hyb_s = make_conv_singular_model(hyb)
    hyb_r = make_conv_reduced_model(hyb_s, cutoff=None, rank=8)

    err = float(jnp.abs(st.predict(hyb_r, x1) - st.predict(hyb, x1)).max())
    print(f"  reduced-vs-dense drift (rank 8 of 15, untrained): {err:.3e}")

    conv_ms = measure("conv front end alone", lambda p, xx: jax.nn.relu(
        causal_conv1d(p, xx[None]))[0], hyb.conv, x1)
    full_ms = measure("dense hybrid (exact)", pred("exact"), hyb, x1)
    measure("reduced hybrid (exact)", pred("exact"), hyb_r, x1, ref=full_ms)
    fast_ms = measure("dense hybrid (fast)", pred("fast"), hyb, x1)
    measure("reduced hybrid (fast)", pred("fast"), hyb_r, x1, ref=fast_ms)
    print(f"  conv share of dense exact: {conv_ms / full_ms:.1%}")

    # -- wide hybrid: Conv(64, k=10) + 3x512 merged r=32 --------------------
    print("\n[wide hybrid] Conv1D(64,k=10)+3x512 merged r=32, batch-1, T=6656")
    whyb = init_conv_lstm(jax.random.PRNGKey(1), in_channels=16, filters=64,
                          kernel_size=10, units=(512, 512, 512))
    whyb_s = make_conv_singular_model(whyb, merged_kernel=True)
    whyb_r = make_conv_reduced_model(whyb_s, cutoff=None, rank=32)

    wconv_ms = measure("conv front end alone", lambda p, xx: jax.nn.relu(
        causal_conv1d(p, xx[None]))[0], whyb.conv, x1)
    wfull_ms = measure("dense hybrid (exact)", pred("exact"), whyb, x1)
    measure("reduced hybrid (exact)", pred("exact"), whyb_r, x1, ref=wfull_ms)
    wfast_ms = measure("dense hybrid (fast)", pred("fast"), whyb, x1)
    measure("reduced hybrid (fast)", pred("fast"), whyb_r, x1, ref=wfast_ms)
    print(f"  conv share of dense exact: {wconv_ms / wfull_ms:.1%}")


if __name__ == "__main__":
    main()
