"""Probe: bf16 weight STORAGE for the wide batch-1 dense recurrence.

Fast mode (single-pass dots) already rounds both operands to bf16 inside
the MXU — but the U matrices still sit in VMEM as f32, and at n=512 the
per-step h-dot re-reads 4 MB of them. If the wide kernel is weight-read-
bound (BENCH_NOTES §floor: bytes/3.72 TB/s term), storing U as bf16
halves that traffic with no additional rounding beyond what the relaxed
dot already does (weight values round once at load instead of per dot).

Earlier finding to reconcile: a bf16-CAST whole model through the XLA
scan was a 1.18× LOSS at 3×512 ("the win is fewer MXU passes, not
smaller weights") — but that measured the scan, where XLA re-streams
weights from HBM and converts; here the kernel keeps U resident and the
read volume itself halves.

Measures (batch-1, T=6656, dense 3x512):
  * hybrid fast, f32-stored U  (current best dense path, ~9.35 ms)
  * hybrid fast, bf16-stored U
  * accuracy of both vs the exact f32 scan
  * VMEM enablement: a 2x1024 hybrid (U = 16 MB f32 would not fit;
    8 MB bf16 does) — compile + run or fail per storage mode.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_wide_bf16_weights.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

T = 6656


def main():
    import jax
    import jax.numpy as jnp

    from svd_lstm_tpu.bench.devtime import device_time_ms
    from svd_lstm_tpu.models.lstm import init_stacked_lstm, stacked_lstm_apply
    from svd_lstm_tpu.ops.pallas_lstm import dense_forward_hybrid

    print(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)
    x1 = jnp.asarray(rng.normal(size=(T, 16)), jnp.float32)

    params = init_stacked_lstm(jax.random.PRNGKey(1), 16, (512, 512, 512))
    exact = jax.jit(
        lambda p, xx: stacked_lstm_apply(p, xx[None], return_sequences=True)[0]
    )
    y_ref = exact(params, x1)

    def run(tag, **kw):
        fn = jax.jit(lambda p, xx: dense_forward_hybrid(p, xx, **kw))
        y = fn(params, x1)
        rel = float(jnp.linalg.norm(y - y_ref) / jnp.linalg.norm(y_ref))
        ms = device_time_ms(fn, params, x1, repeats=3)
        print(f"  {tag:<38s} {ms:8.3f} ms   rel.err {rel:.2e}")
        return ms

    print("\n[3x512 dense, batch-1, T=6656]")
    base = run("hybrid fast, f32 U", dot_precision="default")
    bf16 = run("hybrid fast, bf16-stored U", dot_precision="default",
               weights_bf16=True)
    print(f"  speedup from bf16 storage: {base / bf16:.3f}x")
    run("hybrid exact, f32 U (for reference)")

    # VMEM enablement at n=1024: f32 U is 16 MB/layer
    print("\n[2x1024 dense, batch-1, T=2048]")
    x2 = jnp.asarray(rng.normal(size=(2048, 16)), jnp.float32)
    p2 = init_stacked_lstm(jax.random.PRNGKey(2), 16, (1024, 1024))
    exact2 = jax.jit(
        lambda p, xx: stacked_lstm_apply(p, xx[None], return_sequences=True)[0]
    )
    y2 = exact2(p2, x2)
    for tag, kw in [
        ("hybrid fast, f32 U", dict(dot_precision="default")),
        ("hybrid fast, bf16-stored U",
         dict(dot_precision="default", weights_bf16=True)),
    ]:
        try:
            fn = jax.jit(lambda p, xx: dense_forward_hybrid(p, xx, **kw))
            y = fn(p2, x2)
            rel = float(jnp.linalg.norm(y - y2) / jnp.linalg.norm(y2))
            ms = device_time_ms(fn, p2, x2, repeats=3)
            print(f"  {tag:<38s} {ms:8.3f} ms   rel.err {rel:.2e}")
        except Exception as e:  # noqa: BLE001 — VMEM OOM is the expected failure
            print(f"  {tag:<38s} FAILED: {type(e).__name__}: {str(e)[:120]}")


if __name__ == "__main__":
    main()
