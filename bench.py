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
# r=24 (round 5): the deepest rank with evidenced usable accuracy — the
# progressive truncate-recover pipeline lands it at whole-run RMSE x1.055
# with fast-mode tracking exact (BENCH_NOTES §progressive truncation;
# direct truncation to 24 is a measured knife-edge and NOT the deployment
# recipe). Timing is shape-determined, so the direct-truncated model
# benched here times identically to the progressive-recovered one.
WIDE_RANK = int(os.environ.get("BENCH_WIDE_RANK", 24))
BATCHED_B = int(os.environ.get("BENCH_BATCHED_B", 256))
BATCHED_T = int(os.environ.get("BENCH_BATCHED_T", 128))
SKIP = set(filter(None, os.environ.get("BENCH_SKIP", "").split(",")))
TRAIN_T = int(os.environ.get("BENCH_TRAIN_T", 200))     # BPTT window length
TRAIN_B = int(os.environ.get("BENCH_TRAIN_B", 32))      # reference batch
TRAIN_B_BIG = int(os.environ.get("BENCH_TRAIN_B_BIG", 512))
WIDE_TRAIN_B = int(os.environ.get("BENCH_WIDE_TRAIN_B", 128))
NUM_WINDOWS = 20_000                                    # reference epoch size
V5E_BF16_FLOPS = 197e12                                 # v5e peak, bf16


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
        # machine-checkable perf defense (VERDICT r2 weak #3): measured
        # per-step time as a fraction of the fitted two-component floor
        # (chain latency + VMEM streaming, bench/roofline.py — 99–101%
        # across 4 widths means the kernel is AT its hardware floor)
        from svd_lstm_tpu.bench.roofline import dense_step_cost

        # the kernel runs the P-layout ("auto" resolves to it — compact
        # measures 0.8×); the floor model was fitted on the same layout
        cost = dense_step_cost(INPUT_DIM, UNITS, layout="p")
        measured_us = full_ms * 1e3 / T
        out["floor_fraction_full"] = round(measured_us / cost.floor_us(), 4)
        out["floor_us_per_step"] = round(cost.floor_us(), 4)
        log(
            f"[ref-scale] floor: {cost.floor_us()*1e3:.0f} ns/step, measured "
            f"{measured_us*1e3:.0f} ns/step -> {out['floor_fraction_full']*100:.0f}%"
        )

        # batch-1 fast mode (relaxed single-pass dots, rel.err ~6e-3)
        import svd_lstm_tpu as st_mod

        # one jitted entry serves both families: predict dispatches on the
        # params type and jax.jit caches per pytree structure
        fast_full = fast_red = jax.jit(
            lambda p, xx: st_mod.predict(p, xx, precision="fast")
        )
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

        # one jitted entry serves both families: predict dispatches on the
        # params type and jax.jit caches per pytree structure
        fast_full = fast_red = jax.jit(
            lambda p, xx: st_mod.predict(p, xx, precision="fast")
        )
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
    # straight MFU (VERDICT r2 weak #3): model FLOPs over device time,
    # against the v5e bf16 peak — independently checkable from the config
    flops = 0
    d = INPUT_DIM
    for n in WIDE_UNITS:
        flops += 2 * BATCHED_B * BATCHED_T * (d * 4 * n + n * 4 * n)
        d = n
    mfu_fast = flops / (fast_ms * 1e-3) / V5E_BF16_FLOPS
    log(
        f"[batched] exact {exact_ms:.3f} ms  fast(bf16) {fast_ms:.3f} ms  "
        f"speedup {speedup:.2f}x  rel_err {rel_err:.2e}  "
        f"MFU(fast) {mfu_fast*100:.1f}% of {V5E_BF16_FLOPS/1e12:.0f} TFLOP/s"
    )
    return {
        "config": f"{'x'.join(map(str, WIDE_UNITS))} dense, B={BATCHED_B}, T={BATCHED_T}",
        "exact_ms": round(exact_ms, 4),
        "fast_ms": round(fast_ms, 4),
        "speedup": round(speedup, 3),
        "rel_err": float(f"{rel_err:.3e}"),
        "model_flops": flops,
        "mfu_fast": round(mfu_fast, 4),
    }


def bench_train(jax, jnp, st, device_time_ms, on_tpu):
    """Driver-captured training engine (VERDICT r2 next #2): full train
    step (value_and_grad + adam) device time at the reference scale for
    the f32 XLA scan, the bf16 scan, and the fused Pallas kernel engine —
    plus the kernel-accelerated singular fine-tune step (the reference's
    central compression stage, code/svd_acceleration_v3.py:119-128).
    Derived per-epoch times use the reference's 20 000-window epoch."""
    import optax

    from svd_lstm_tpu.config import FactorConfig
    from svd_lstm_tpu.models.lstm import init_stacked_lstm, stacked_lstm_apply
    from svd_lstm_tpu.models.singular import singular_lstm_apply
    from svd_lstm_tpu.ops.pallas_train import stacked_lstm_apply_fast_train
    from svd_lstm_tpu.ops.singular_train import singular_lstm_apply_fast_train
    from svd_lstm_tpu.train.finetune import (
        make_finetune_optimizer,
        regularization_loss,
    )

    rng = np.random.default_rng(3)
    params = init_stacked_lstm(jax.random.PRNGKey(3), INPUT_DIM, UNITS)
    opt = optax.adam(1e-3)
    s0 = opt.init(params)
    interpret = not on_tpu

    def mk_step(apply_fn, optimizer, scope=None, extra=None):
        def loss_fn(p, xx, yy):
            pred = apply_fn(p, xx, return_sequences=False)[..., 0]
            loss = jnp.mean((pred - yy) ** 2)
            if extra is not None:
                loss = loss + extra(p)
            return loss

        @jax.jit
        def step(p, s, xx, yy):
            if scope:
                with jax.default_matmul_precision(scope):
                    l, g = jax.value_and_grad(loss_fn)(p, xx, yy)
            else:
                l, g = jax.value_and_grad(loss_fn)(p, xx, yy)
            u, s = optimizer.update(g, s, p)
            return optax.apply_updates(p, u), s, l

        return step

    kernel_apply = lambda p, xx, return_sequences: stacked_lstm_apply_fast_train(  # noqa: E731
        p, xx, return_sequences=return_sequences, interpret=interpret
    )

    from svd_lstm_tpu.bench.roofline import (
        narrow_train_step_cost,
        wide_train_step_cost,
    )

    def add_floor(entry, cost, key):
        """floor_fraction (vs the kernel-layout two-component floor) and
        train MFU (model FLOPs over the v5e bf16 peak) for the kernel row
        (VERDICT r3 next #3). TPU-only: the floor constants are hardware."""
        if not on_tpu:
            return
        ms = entry[key]
        entry["floor_ms"] = round(cost.floor_ms(), 4)
        entry["floor_fraction"] = round(cost.floor_fraction(ms), 3)
        entry["train_mfu"] = round(cost.mfu(ms), 4)

    out = {"config": f"4x40 T={TRAIN_T}, full step incl. adam; epoch = 20000 windows"}
    for B in (TRAIN_B, TRAIN_B_BIG):
        x = jnp.asarray(rng.normal(size=(B, TRAIN_T, INPUT_DIM)), jnp.float32)
        y = jnp.asarray(rng.normal(size=(B,)), jnp.float32)
        steps_per_epoch = NUM_WINDOWS // B
        entry = {}
        for name, step in [
            ("f32_scan", mk_step(stacked_lstm_apply, opt)),
            ("bf16_scan", mk_step(stacked_lstm_apply, opt, scope="bfloat16")),
            ("fused_kernel", mk_step(kernel_apply, opt)),
        ]:
            ms = device_time_ms(step, params, s0, x, y)
            entry[name + "_ms"] = round(ms, 4)
            entry[name + "_epoch_ms"] = round(ms * steps_per_epoch, 1)
        entry["kernel_speedup_vs_f32"] = round(
            entry["f32_scan_ms"] / entry["fused_kernel_ms"], 3
        )
        # floor in the layout the dispatch actually resolves: compact="auto"
        # routes the eligible dense stack to the compact-gate kernels at
        # the measured crossover (fewer executed MACs -> a LOWER floor to
        # answer to). Import the dispatch's own constant so bench and
        # dispatch cannot disagree (round-5 review).
        from svd_lstm_tpu.ops.pallas_train import _COMPACT_MIN_BATCH

        layout = "compact" if B >= _COMPACT_MIN_BATCH else "p"
        entry["kernel_layout"] = layout
        add_floor(
            entry,
            narrow_train_step_cost(INPUT_DIM, UNITS, B, TRAIN_T, layout=layout),
            "fused_kernel_ms",
        )
        log(f"[train] B={B}: {entry}")
        out[f"B{B}"] = entry

    # the wide 3×512 train step (VERDICT r2 next #2's second half): same
    # three paths at the BASELINE stretch width, B=128/T=200. The kernel
    # path scans the fully-fused layer kernel over stacked weights
    # (ops/pallas_train_wide.py: x-projection + weight grads in-kernel, no
    # (T, B, 4n) HBM arrays — round 4; BENCH_NOTES §training floor).
    wunits = tuple(int(u) for u in WIDE_UNITS)
    wparams = init_stacked_lstm(jax.random.PRNGKey(4), INPUT_DIM, wunits)
    ws0 = opt.init(wparams)
    xw = jnp.asarray(
        rng.normal(size=(WIDE_TRAIN_B, TRAIN_T, INPUT_DIM)), jnp.float32
    )
    yw = jnp.asarray(rng.normal(size=(WIDE_TRAIN_B,)), jnp.float32)
    wide = {"config": f"{'x'.join(map(str, wunits))} B={WIDE_TRAIN_B} T={TRAIN_T}"}
    for name, step in [
        ("f32_scan", mk_step(stacked_lstm_apply, opt)),
        ("bf16_scan", mk_step(stacked_lstm_apply, opt, scope="bfloat16")),
        ("fused_kernel", mk_step(kernel_apply, opt)),
    ]:
        ms = device_time_ms(step, wparams, ws0, xw, yw)
        wide[name + "_ms"] = round(ms, 4)
    wide["kernel_speedup_vs_f32"] = round(
        wide["f32_scan_ms"] / wide["fused_kernel_ms"], 3
    )
    add_floor(
        wide, wide_train_step_cost(INPUT_DIM, wunits, WIDE_TRAIN_B, TRAIN_T),
        "fused_kernel_ms",
    )
    log(f"[train] wide {wide['config']}: {wide}")
    out["wide"] = wide

    # the singular fine-tune step (σ-only masked adam + Hoyer)
    fcfg = FactorConfig(hoyer=0.01)
    sparams = st.make_singular_model(params, merged_kernel=False)
    fopt = make_finetune_optimizer(sparams, fcfg)
    fs0 = fopt.init(sparams)
    reg = lambda p: regularization_loss(p, fcfg)  # noqa: E731
    ker_ft = lambda p, xx, return_sequences: singular_lstm_apply_fast_train(  # noqa: E731
        p, xx, return_sequences=return_sequences, interpret=interpret
    )
    x = jnp.asarray(rng.normal(size=(TRAIN_B, TRAIN_T, INPUT_DIM)), jnp.float32)
    y = jnp.asarray(rng.normal(size=(TRAIN_B,)), jnp.float32)
    ft = {}
    for name, step in [
        ("f32_scan", mk_step(singular_lstm_apply, fopt, extra=reg)),
        ("fused_kernel", mk_step(ker_ft, fopt, extra=reg)),
    ]:
        ms = device_time_ms(step, sparams, fs0, x, y)
        ft[name + "_ms"] = round(ms, 4)
    ft["kernel_speedup_vs_f32"] = round(
        ft["f32_scan_ms"] / ft["fused_kernel_ms"], 3
    )
    # the reconstruction W=(UΣ)V adds a handful of (n, 4n)-sized dots per
    # STEP CALL (not per timestep) — negligible next to the T=200 sweep,
    # so the dense narrow cost model applies to the fine-tune rows too
    add_floor(
        ft, narrow_train_step_cost(INPUT_DIM, UNITS, TRAIN_B, TRAIN_T),
        "fused_kernel_ms",
    )
    log(f"[train] singular finetune B={TRAIN_B}: {ft}")
    out["singular_finetune"] = ft

    # large-batch fine-tune: at B=512 the dispatch now runs the
    # whole-batch reconstruction-fed program (boundary moved 496 -> 512
    # post no-copy bwd, round 5); above it the kernel runs over balanced
    # ~256-row chunks (ops/singular_train.chunked_fast_train). Floor in
    # the layout the dispatch resolves (compact at B >= crossover via the
    # eligible dense view).
    from svd_lstm_tpu.ops.pallas_train import _COMPACT_MIN_BATCH

    xb = jnp.asarray(
        rng.normal(size=(TRAIN_B_BIG, TRAIN_T, INPUT_DIM)), jnp.float32
    )
    yb = jnp.asarray(rng.normal(size=(TRAIN_B_BIG,)), jnp.float32)
    ftb = {}
    for name, step in [
        ("f32_scan", mk_step(singular_lstm_apply, fopt, extra=reg)),
        ("fused_kernel", mk_step(ker_ft, fopt, extra=reg)),
    ]:
        ms = device_time_ms(step, sparams, fs0, xb, yb)
        ftb[name + "_ms"] = round(ms, 4)
    ftb["kernel_speedup_vs_f32"] = round(
        ftb["f32_scan_ms"] / ftb["fused_kernel_ms"], 3
    )
    ftb_layout = "compact" if TRAIN_B_BIG >= _COMPACT_MIN_BATCH else "p"
    ftb["kernel_layout"] = ftb_layout
    add_floor(
        ftb,
        narrow_train_step_cost(
            INPUT_DIM, UNITS, TRAIN_B_BIG, TRAIN_T, layout=ftb_layout
        ),
        "fused_kernel_ms",
    )
    log(f"[train] singular finetune B={TRAIN_B_BIG} (chunked): {ftb}")
    out["singular_finetune_big"] = ftb

    # the post-truncation recovery fine-tune step (beyond-reference: the
    # reference's reduced cell is frozen, code/svd_classes_v3.py:249-315).
    # Same operating point as reference_scale: 4x40 split r=25.
    from svd_lstm_tpu.models.reduced import reduced_lstm_apply
    from svd_lstm_tpu.ops.reduced_train import reduced_lstm_apply_fast_train

    rmodel = st.make_reduced_model(sparams, cutoff=None, rank=25)
    ropt = optax.adam(1e-3)
    rs0 = ropt.init(rmodel)
    ker_rec = lambda p, xx, return_sequences: reduced_lstm_apply_fast_train(  # noqa: E731
        p, xx, return_sequences=return_sequences, interpret=interpret
    )
    rec = {}
    for name, step in [
        ("f32_scan", mk_step(reduced_lstm_apply, ropt)),
        ("fused_kernel", mk_step(ker_rec, ropt)),
    ]:
        ms = device_time_ms(step, rmodel, rs0, x, y)
        rec[name + "_ms"] = round(ms, 4)
    rec["kernel_speedup_vs_f32"] = round(
        rec["f32_scan_ms"] / rec["fused_kernel_ms"], 3
    )
    add_floor(
        rec, narrow_train_step_cost(INPUT_DIM, UNITS, TRAIN_B, TRAIN_T),
        "fused_kernel_ms",
    )
    log(f"[train] reduced recovery B={TRAIN_B}: {rec}")
    out["reduced_recover"] = rec
    return out


def main():
    # Backend-init watchdog: a wedged TPU tunnel hangs jax.devices()
    # indefinitely (no local timeout exists for remote backend init). An
    # explicit error line beats an eternal hang with no output at all.
    import threading

    init_done = threading.Event()
    timeout_s = float(os.environ.get("BENCH_INIT_TIMEOUT_S", "600"))

    def _watchdog():
        if not init_done.wait(timeout_s):
            print(
                json.dumps(
                    {
                        "metric": "whole_run_latency_ratio_reduced_over_full",
                        "value": None,
                        "unit": "ratio",
                        "vs_baseline": None,
                        "error": (
                            f"backend init did not complete within "
                            f"{timeout_s:.0f}s — TPU tunnel unreachable"
                        ),
                        # NOT a fresh measurement: pointer to the last
                        # complete real-chip run so a wedged round still
                        # records where the evidence lives.
                        "last_good_capture": {
                            "captured_utc": "2026-08-17T18:55Z",
                            "commit": "25866ea",
                            "headline_ratio": 0.705,
                            "where": (
                                "BENCH_NOTES.md §'Round-3 headline capture' "
                                "(verbatim full JSON line)"
                            ),
                        },
                    }
                ),
                flush=True,
            )
            os._exit(3)

    threading.Thread(target=_watchdog, daemon=True).start()

    import jax
    import jax.numpy as jnp

    import svd_lstm_tpu as st
    from svd_lstm_tpu.bench.devtime import device_time_ms

    log(f"devices: {jax.devices()}")
    init_done.set()
    on_tpu = jax.devices()[0].platform != "cpu"

    ref = None if "ref" in SKIP else bench_reference_scale(
        jax, jnp, st, device_time_ms, on_tpu
    )
    wide = None if "wide" in SKIP else bench_wide(jax, jnp, st, device_time_ms, on_tpu)
    batched = None if "batched" in SKIP else bench_batched_fast(
        jax, jnp, st, device_time_ms
    )
    train = None if "train" in SKIP else bench_train(
        jax, jnp, st, device_time_ms, on_tpu
    )

    # Headline: the best compression latency ratio this framework delivers
    # at batch-1 whole-run (the wide operating point), against the
    # reference's 1.31 (it never went below 1.0 at ANY size or rank).
    head_src = wide or ref
    if head_src is None:
        head_src = {"ratio": None, "config": "batched-only run (ref+wide skipped)"}
    headline = head_src["ratio"]

    # Full detail tree goes to a file; stdout gets ONE compact line. The
    # driver captures only the last ~2000 chars of stdout and parses the
    # final JSON line — round 4's ever-growing single line overflowed that
    # window and the headline fields were truncated away (VERDICT r4 weak
    # #2). Keep the printed line well under the window.
    detail = {
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
        "train": train,
    }
    # The repo-root BENCH_DETAIL.json is COMMITTED EVIDENCE: only a real
    # TPU run may overwrite it (a CPU smoke run once clobbered the r=24
    # capture with 8x8/T=256 numbers — round-5 review finding). Smoke and
    # CPU runs write to /tmp; BENCH_DETAIL_PATH overrides either way.
    default_detail = (
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "BENCH_DETAIL.json")
        if on_tpu
        else "/tmp/BENCH_DETAIL.json"
    )
    detail_path = os.environ.get("BENCH_DETAIL_PATH") or default_detail
    with open(detail_path, "w") as f:
        json.dump(detail, f, indent=1)
    log(f"full detail -> {detail_path}")

    def pick(d, *keys):
        return {k: d[k] for k in keys if d and k in d} if d else None

    compact = {
        "metric": detail["metric"],
        "value": headline,
        "unit": "ratio",
        "vs_baseline": detail["vs_baseline"],
        "wide": pick(wide, "ratio") and {
            "ratio": wide["ratio"],
            "fast_ratio": wide.get("fast", {}).get("ratio"),
        },
        "ref_scale": pick(ref, "ratio", "floor_fraction_full"),
        "batched_fast": pick(batched, "speedup", "mfu_fast"),
        "train_floor_fractions": {
            k: v.get("floor_fraction")
            for k, v in (train or {}).items()
            if isinstance(v, dict) and "floor_fraction" in v
        } or None,
        "detail": "BENCH_DETAIL.json",
    }
    line = json.dumps(compact)
    assert len(line) < 1200, f"headline line too long ({len(line)} chars)"
    print(line)


if __name__ == "__main__":
    main()
