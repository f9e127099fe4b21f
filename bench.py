"""Headline benchmark: SVD-compressed vs full LSTM inference, device-timed.

Protocol parity with the reference (time the whole-run predict, full vs
reduced — code/svd_acceleration_v3.py:147-152, plots/timing_plot.png). The
reference's Python/Keras reduced model ran 1.31-1.39× SLOWER than its full
model at every rank (slide 15); the north star is a compressed step that is
actually FASTER (BASELINE.md).

One run measures three operating points (one JSON report, VERDICT.md #3):

* **wide** (headline ``value``): 3×512 merged r=32, batch-1, T=6656 — the
  regime where rank reduction genuinely wins on TPU. Reduced runs the
  hybrid layout (hoisted factored x-side + folded two-step Pallas
  recurrence); full runs the best dense path (XLA scan). Measured 0.70×.
* **reference_scale**: 4×40 r=25 (the published sweet spot k=15 scaled to
  n=40), batch-1, T=6656 — both through the fused compact-weight Pallas
  kernel (reduced dense-reconstructed: exact, and the fastest layout at
  this width — the per-step chain is latency-bound, BENCH_NOTES.md).
  Parity ~1.00 vs the reference's 1.31.
* **batched_fast**: batched throughput (3×512, B=256, T=128), dense exact
  vs ``predict(precision="fast")`` (bf16 x-side + VMEM-resident Pallas
  recurrence, ops/pallas_batched.py) — the deployment-throughput win
  (~7.4×).

Timing is on-device execution time via the JAX profiler
(svd_lstm_tpu/bench/devtime.py) — wall clock through a tunneled TPU backend
measures dispatch, not compute.

Prints ONE JSON line on stdout; diagnostics go to stderr.
"""

import json
import os
import sys

import numpy as np

REFERENCE_RATIO = 1.31  # timing(reduced)/timing(full), reference slide 15

# Overridable for CI smoke runs (BENCH_T=512 BENCH_SKIP=wide,batched python bench.py)
T = int(os.environ.get("BENCH_T", 6656))
UNITS = tuple(int(u) for u in os.environ.get("BENCH_UNITS", "40,40,40,40").split(","))
INPUT_DIM = 16
RANK = int(os.environ.get("BENCH_RANK", 25))
WIDE_UNITS = tuple(
    int(u) for u in os.environ.get("BENCH_WIDE_UNITS", "512,512,512").split(",")
)
WIDE_RANK = int(os.environ.get("BENCH_WIDE_RANK", 32))
BATCHED_B = int(os.environ.get("BENCH_BATCHED_B", 256))
BATCHED_T = int(os.environ.get("BENCH_BATCHED_T", 128))
SKIP = set(filter(None, os.environ.get("BENCH_SKIP", "").split(",")))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench_reference_scale(jax, jnp, st, device_time_ms, on_tpu):
    from svd_lstm_tpu.models.lstm import init_stacked_lstm, stacked_lstm_apply
    from svd_lstm_tpu.models.reduced import reduced_lstm_apply
    from svd_lstm_tpu.ops.layouts import reduced_forward_fused
    from svd_lstm_tpu.ops.pallas_lstm import fused_dense_stack_pallas

    rng = np.random.default_rng(0)
    x1 = jnp.asarray(rng.normal(size=(T, INPUT_DIM)), jnp.float32)
    x = x1[None]

    params = init_stacked_lstm(jax.random.PRNGKey(0), INPUT_DIM, UNITS)
    smodel = st.make_singular_model(params, merged_kernel=False)
    rmodel = st.make_reduced_model(smodel, rank=RANK)

    scan_full = jax.jit(lambda p, xx: stacked_lstm_apply(p, xx, return_sequences=True))
    if on_tpu:
        full_fn = jax.jit(fused_dense_stack_pallas)
        red_fn = jax.jit(reduced_forward_fused)
    else:
        from svd_lstm_tpu.ops.layouts import reduced_forward_dense_recurrent

        full_fn = jax.jit(lambda p, xx: scan_full(p, xx[None])[0])
        red_fn = jax.jit(
            lambda p, xx: reduced_forward_dense_recurrent(
                p, xx[None], return_sequences=True
            )[0]
        )

    # correctness gates: execution layouts must reproduce the scan semantics
    full_err = float(jnp.abs(full_fn(params, x1) - scan_full(params, x)[0]).max())
    red_err = float(
        jnp.abs(
            red_fn(rmodel, x1)
            - jax.jit(lambda p, xx: reduced_lstm_apply(p, xx, return_sequences=True))(
                rmodel, x
            )[0]
        ).max()
    )
    log(f"[ref-scale] layout exactness: full {full_err:.3e}  reduced {red_err:.3e}")
    assert full_err < 5e-4 and red_err < 5e-4, "kernel layout changed the math"

    full_ms = device_time_ms(full_fn, params, x1, repeats=3)
    red_ms = device_time_ms(red_fn, rmodel, x1, repeats=3)
    ratio = red_ms / full_ms

    full_w = sum(int(np.asarray(l).size) for layer in params.layers for l in layer)
    red_w = sum(l.weight_count() for l in rmodel.layers)
    log(
        f"[ref-scale] full {full_ms:.3f} ms  reduced {red_ms:.3f} ms  "
        f"ratio {ratio:.4f} (reference: {REFERENCE_RATIO})  "
        f"weights {full_w} -> {red_w}"
    )
    out = {
        "config": f"4x40 split r={RANK}, batch-1, T={T}",
        "full_ms": round(full_ms, 4),
        "reduced_ms": round(red_ms, 4),
        "ratio": round(ratio, 4),
        "weights_full": full_w,
        "weights_reduced": red_w,
    }
    if on_tpu:
        # batch-1 fast mode (relaxed single-pass dots, rel.err ~6e-3)
        import svd_lstm_tpu as st_mod

        fast_full = jax.jit(lambda p, xx: st_mod.predict(p, xx, precision="fast"))
        fast_red = jax.jit(lambda p, xx: st_mod.predict(p, xx, precision="fast"))
        ef = float(jnp.abs(fast_full(params, x1) - scan_full(params, x)[0]).max())
        ff_ms = device_time_ms(fast_full, params, x1, repeats=3)
        fr_ms = device_time_ms(fast_red, rmodel, x1, repeats=3)
        log(
            f"[ref-scale] fast mode: full {ff_ms:.3f} ms  reduced {fr_ms:.3f} ms  "
            f"(max err vs exact {ef:.2e})"
        )
        out["fast"] = {
            "full_ms": round(ff_ms, 4),
            "reduced_ms": round(fr_ms, 4),
            "ratio": round(fr_ms / ff_ms, 4),
        }
    return out


def bench_wide(jax, jnp, st, device_time_ms, on_tpu):
    from svd_lstm_tpu.models.lstm import init_stacked_lstm, stacked_lstm_apply
    from svd_lstm_tpu.models.reduced import reduced_lstm_apply

    rng = np.random.default_rng(1)
    x1 = jnp.asarray(rng.normal(size=(T, INPUT_DIM)), jnp.float32)

    params = init_stacked_lstm(jax.random.PRNGKey(1), INPUT_DIM, WIDE_UNITS)
    smodel = st.make_singular_model(params, merged_kernel=True)
    rmodel = st.make_reduced_model(smodel, rank=WIDE_RANK)

    # best dense path at this width: the XLA scan (hoisted x-projections)
    full_fn = jax.jit(
        lambda p, xx: stacked_lstm_apply(p, xx[None], return_sequences=True)[0]
    )
    if on_tpu:
        from svd_lstm_tpu.ops.pallas_lstm import reduced_forward_hybrid

        red_fn = jax.jit(reduced_forward_hybrid)
    else:
        from svd_lstm_tpu.ops.layouts import reduced_forward_dense_recurrent

        red_fn = jax.jit(
            lambda p, xx: reduced_forward_dense_recurrent(
                p, xx[None], return_sequences=True
            )[0]
        )

    red_err = float(
        jnp.abs(
            red_fn(rmodel, x1)
            - jax.jit(lambda p, xx: reduced_lstm_apply(p, xx, return_sequences=True))(
                rmodel, x1[None]
            )[0]
        ).max()
    )
    log(f"[wide] hybrid-vs-two-step-scan exactness: {red_err:.3e}")
    assert red_err < 5e-4, "hybrid layout changed the math"

    full_ms = device_time_ms(full_fn, params, x1, repeats=3)
    red_ms = device_time_ms(red_fn, rmodel, x1, repeats=3)
    ratio = red_ms / full_ms
    log(
        f"[wide] full {full_ms:.3f} ms  reduced(hybrid) {red_ms:.3f} ms  "
        f"ratio {ratio:.4f}"
    )
    out = {
        "config": f"{'x'.join(map(str, WIDE_UNITS))} merged r={WIDE_RANK}, batch-1, T={T}",
        "full_ms": round(full_ms, 4),
        "reduced_ms": round(red_ms, 4),
        "ratio": round(ratio, 4),
    }
    if on_tpu:
        # batch-1 fast mode: both models through relaxed-dot kernels (the
        # dense hybrid beats the scan once dots are single-pass)
        import svd_lstm_tpu as st_mod

        fast_full = jax.jit(lambda p, xx: st_mod.predict(p, xx, precision="fast"))
        fast_red = jax.jit(lambda p, xx: st_mod.predict(p, xx, precision="fast"))
        y_exact = full_fn(params, x1)
        ef = float(
            jnp.linalg.norm(fast_full(params, x1) - y_exact)
            / jnp.linalg.norm(y_exact)
        )
        ff_ms = device_time_ms(fast_full, params, x1, repeats=3)
        fr_ms = device_time_ms(fast_red, rmodel, x1, repeats=3)
        log(
            f"[wide] fast mode: full {ff_ms:.3f} ms  reduced {fr_ms:.3f} ms  "
            f"ratio {fr_ms / ff_ms:.4f}  (rel.err vs exact {ef:.2e})"
        )
        out["fast"] = {
            "full_ms": round(ff_ms, 4),
            "reduced_ms": round(fr_ms, 4),
            "ratio": round(fr_ms / ff_ms, 4),
            "rel_err": float(f"{ef:.3e}"),
        }
    return out


def bench_batched_fast(jax, jnp, st, device_time_ms):
    from svd_lstm_tpu.models.lstm import init_stacked_lstm

    rng = np.random.default_rng(2)
    X = jnp.asarray(
        rng.normal(size=(BATCHED_B, BATCHED_T, INPUT_DIM)), jnp.float32
    )
    params = init_stacked_lstm(jax.random.PRNGKey(2), INPUT_DIM, WIDE_UNITS)

    exact_fn = jax.jit(lambda p, xx: st.predict(p, xx, precision="exact"))
    fast_fn = jax.jit(lambda p, xx: st.predict(p, xx, precision="fast"))

    out_e = exact_fn(params, X)
    out_f = fast_fn(params, X)
    scale = float(jnp.abs(out_e).max())
    rel_err = float(jnp.abs(out_f - out_e).max()) / max(scale, 1e-9)

    exact_ms = device_time_ms(exact_fn, params, X, repeats=3)
    fast_ms = device_time_ms(fast_fn, params, X, repeats=3)
    speedup = exact_ms / fast_ms
    log(
        f"[batched] exact {exact_ms:.3f} ms  fast(bf16) {fast_ms:.3f} ms  "
        f"speedup {speedup:.2f}x  rel_err {rel_err:.2e}"
    )
    return {
        "config": f"{'x'.join(map(str, WIDE_UNITS))} dense, B={BATCHED_B}, T={BATCHED_T}",
        "exact_ms": round(exact_ms, 4),
        "fast_ms": round(fast_ms, 4),
        "speedup": round(speedup, 3),
        "rel_err": float(f"{rel_err:.3e}"),
    }


def main():
    import jax
    import jax.numpy as jnp

    import svd_lstm_tpu as st
    from svd_lstm_tpu.bench.devtime import device_time_ms

    log(f"devices: {jax.devices()}")
    on_tpu = jax.devices()[0].platform != "cpu"

    ref = None if "ref" in SKIP else bench_reference_scale(
        jax, jnp, st, device_time_ms, on_tpu
    )
    wide = None if "wide" in SKIP else bench_wide(jax, jnp, st, device_time_ms, on_tpu)
    batched = None if "batched" in SKIP else bench_batched_fast(
        jax, jnp, st, device_time_ms
    )

    # Headline: the best compression latency ratio this framework delivers
    # at batch-1 whole-run (the wide operating point), against the
    # reference's 1.31 (it never went below 1.0 at ANY size or rank).
    head_src = wide or ref
    if head_src is None:
        head_src = {"ratio": None, "config": "batched-only run (ref+wide skipped)"}
    headline = head_src["ratio"]
    print(
        json.dumps(
            {
                "metric": "whole_run_latency_ratio_reduced_over_full",
                "value": headline,
                "unit": (
                    f"ratio (batch-1 device-time; headline config: "
                    f"{head_src['config']})"
                ),
                "vs_baseline": (
                    round(REFERENCE_RATIO / headline, 4) if headline else None
                ),
                "reference_scale": ref,
                "wide": wide,
                "batched_fast": batched,
            }
        )
    )


if __name__ == "__main__":
    main()
