"""Probe: raw int8-vs-bf16 matmul throughput via XLA on v5e.

Isolates the question probe_int8_batched.py raised: is the slowdown the
quantization overhead, or does XLA's int8 dot not reach the MXU's 2x int8
rate at all? Times a bare (M,K)@(K,N) at LSTM-batched shapes and one large
square shape, pre-quantized inputs (no dynamic-quant cost included).
"""
import numpy as np
import jax
import jax.numpy as jnp

from svd_lstm_tpu.bench.devtime import device_time_ms

rng = np.random.default_rng(0)


def bench(M, K, N):
    a8 = jnp.asarray(rng.integers(-127, 127, size=(M, K)), jnp.int8)
    b8 = jnp.asarray(rng.integers(-127, 127, size=(K, N)), jnp.int8)
    abf = jnp.asarray(rng.normal(size=(M, K)), jnp.bfloat16)
    bbf = jnp.asarray(rng.normal(size=(K, N)), jnp.bfloat16)

    f8 = jax.jit(
        lambda a, b: jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
    )
    fbf = jax.jit(
        lambda a, b: jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
    )
    t8 = device_time_ms(f8, a8, b8, repeats=5)
    tbf = device_time_ms(fbf, abf, bbf, repeats=5)
    gflop = 2 * M * K * N / 1e9
    print(
        f"({M:5d},{K:5d})@({K:5d},{N:5d})  int8 {t8:7.3f} ms ({gflop / t8:7.1f} GOP/ms)"
        f"   bf16 {tbf:7.3f} ms ({gflop / tbf:7.1f} GFLOP/ms)   int8/bf16 {t8 / tbf:.2f}"
    )


if __name__ == "__main__":
    bench(256 * 128, 512, 2048)   # hoisted x-side projection shape
    bench(256, 512, 2048)         # per-step recurrence shape
    bench(4096, 4096, 4096)       # large square (peak-rate check)
    bench(8192, 8192, 8192)
