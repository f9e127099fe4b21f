"""TPU frame-at-a-time latency, measured honestly (VERDICT r3 next #7).

Three numbers for the 4x40 reference model, batch-1:
 1. device time of ONE jitted stream_step (the chip's share);
 2. wall time per call in a frame-at-a-time loop (dispatch-bound; through
    the axon tunnel this measures the tunnel, stated as such — a locally
    attached TPU pays host->device dispatch instead, typically O(100 us));
 3. stream_many chunked variants (K frames per dispatch) — the mitigation
    when ~K-frame latency is tolerable.

Deployment guidance this backs (docs/MIGRATION.md): hard real-time
frame-at-a-time belongs on the native C++ consumer (4.2 us/step, zero
dispatch); the TPU wins whole-run and batched inference.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from svd_lstm_tpu.bench.devtime import device_time_ms
from svd_lstm_tpu.models.lstm import init_stacked_lstm
from svd_lstm_tpu.models.streaming import init_stream, stream_many, stream_step

params = init_stacked_lstm(jax.random.PRNGKey(0), 16, (40, 40, 40, 40))
state0 = init_stream(params)
rng = np.random.default_rng(0)
frame = jnp.asarray(rng.normal(size=(1, 16)), jnp.float32)

step = jax.jit(stream_step)
y, st = step(params, state0, frame)
jax.block_until_ready(y)

dev_ms = device_time_ms(step, params, state0, frame)
print(f"single stream_step device time: {dev_ms*1e3:.1f} us", flush=True)

N = 100
st = state0
t0 = time.perf_counter()
for _ in range(N):
    y, st = step(params, st, frame)
jax.block_until_ready(y)
wall = (time.perf_counter() - t0) / N
print(f"single stream_step wall/call over {N}: {wall*1e3:.2f} ms "
      f"(tunnel dispatch-bound)", flush=True)

many = jax.jit(stream_many)
for K in (16, 64, 256):
    frames = jnp.asarray(rng.normal(size=(1, K, 16)), jnp.float32)
    y, st2 = many(params, state0, frames)
    jax.block_until_ready(y)
    ms = device_time_ms(many, params, state0, frames)
    t0 = time.perf_counter()
    for _ in range(20):
        y, st2 = many(params, st2, frames)
    jax.block_until_ready(y)
    wall_k = (time.perf_counter() - t0) / 20
    print(f"stream_many K={K:3d}: device {ms*1e3/K:6.2f} us/frame  "
          f"wall {wall_k*1e6/K:7.1f} us/frame ({wall_k*1e3:.1f} ms/chunk)",
          flush=True)
