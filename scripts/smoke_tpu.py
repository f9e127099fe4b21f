"""Quick TPU smoke + first timing signal for the kernels (not a benchmark)."""
import time

import numpy as np
import jax
import jax.numpy as jnp

import svd_lstm_tpu  # noqa: F401  (sets matmul precision)
from svd_lstm_tpu.factor.svd import make_reduced_model, make_singular_model
from svd_lstm_tpu.models.lstm import init_stacked_lstm, stacked_lstm_apply
from svd_lstm_tpu.models.reduced import reduced_lstm_apply
from svd_lstm_tpu.ops.pallas_lstm import (
    dense_forward_hybrid,
    fused_dense_stack_pallas,
    fused_reduced_stack_pallas,
    reduced_forward_hybrid,
)

print("devices:", jax.devices())

T = 6656
rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(T, 16)), jnp.float32)

params = init_stacked_lstm(jax.random.PRNGKey(0), 16, (40, 40, 40, 40))
smodel = make_singular_model(params, merged_kernel=False)
rmodel = make_reduced_model(smodel, rank=25)


def bench(name, fn, *args, iters=5):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    best = min(ts)
    print(f"{name:28s} {best*1e3:9.3f} ms   ({best/T*1e6:7.3f} us/step)")
    return np.asarray(out), best


scan_dense = jax.jit(lambda p, xx: stacked_lstm_apply(p, xx, return_sequences=True))
scan_reduced = jax.jit(lambda p, xx: reduced_lstm_apply(p, xx, return_sequences=True))

y_scan, t_scan = bench("xla scan dense", scan_dense, params, x[None])
y_scan_r, t_scan_r = bench("xla scan reduced r=25", scan_reduced, rmodel, x[None])
y_fd, t_fd = bench("pallas fused dense", fused_dense_stack_pallas, params, x)
y_fr, t_fr = bench("pallas fused reduced r=25", fused_reduced_stack_pallas, rmodel, x)
y_hd, t_hd = bench("hybrid dense", dense_forward_hybrid, params, x)
y_hr, t_hr = bench("hybrid reduced r=25", reduced_forward_hybrid, rmodel, x)

print("max|fused dense - scan dense|:", np.abs(y_fd[:, 0] - y_scan[0, :, 0]).max())
print("max|fused red   - scan red  |:", np.abs(y_fr[:, 0] - y_scan_r[0, :, 0]).max())
print("max|hybrid dense- scan dense|:", np.abs(y_hd[:, 0] - y_scan[0, :, 0]).max())

# Wall clock above is dispatch-dominated through the tunnel; the headline
# ratio must come from on-device time of the paths bench.py actually uses
# (fused dense kernel vs dense-reconstructed reduced through the same kernel).
from svd_lstm_tpu.bench.devtime import device_time_ms
from svd_lstm_tpu.ops.layouts import reduced_forward_fused

full_ms = device_time_ms(jax.jit(fused_dense_stack_pallas), params, x, repeats=3)
red_ms = device_time_ms(jax.jit(reduced_forward_fused), rmodel, x, repeats=3)
print(
    f"device-time reduced/full (bench.py paths): {red_ms/full_ms:.3f} "
    f"({red_ms:.3f}/{full_ms:.3f} ms; reference got 1.31, lower is better)"
)

# batch-1 fast mode (single-pass dots): ~1.5x the exact kernel at ~3e-3 err
from svd_lstm_tpu.api import predict

fast_fn = jax.jit(lambda p, xx: predict(p, xx, precision="fast"))
y_fast = np.asarray(fast_fn(params, x))
fast_ms = device_time_ms(fast_fn, params, x, repeats=3)
print(
    f"batch-1 fast mode: {fast_ms:.3f} ms (exact kernel {full_ms:.3f}); "
    f"max err vs scan {np.abs(y_fast[:, 0] - y_scan[0, :, 0]).max():.2e}"
)

# batched fast mode (VMEM-resident recurrence): 7.4x vs exact at 3x512
xb = jnp.asarray(rng.normal(size=(64, 128, 16)), jnp.float32)
wide = init_stacked_lstm(jax.random.PRNGKey(1), 16, (256, 256))
bexact = jax.jit(lambda p, xx: predict(p, xx, precision="exact"))
bfast = jax.jit(lambda p, xx: predict(p, xx, precision="fast"))
be_ms = device_time_ms(bexact, wide, xb, repeats=3)
bf_ms = device_time_ms(bfast, wide, xb, repeats=3)
err = float(jnp.abs(bfast(wide, xb) - bexact(wide, xb)).max())
print(
    f"batched fast (2x256, B=64): {bf_ms:.3f} ms vs exact {be_ms:.3f} "
    f"({be_ms/bf_ms:.2f}x; max err {err:.2e})"
)
