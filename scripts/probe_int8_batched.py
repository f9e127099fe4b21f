"""Probe: int8 (w8a8) batched-throughput inference via XLA dot_general.

BENCH_NOTES places ``precision="fast"`` (bf16) at 3.32 ms for 3x512 /
B=256 / T=128 -- roughly half of the v5e bf16 MXU peak by FLOP count. The
v5e MXU runs int8 x int8 -> int32 at 2x its bf16 rate, and the Mosaic
int8-in-Pallas crash (scripts/probe_precision.py) does NOT apply here:
the batched path is pure XLA einsums/scan.

Variants (dense 3x512, B=256, T=128, vs the exact f32 oracle):
  A. exact f32                    (package default; reference point)
  B. bf16 fast                    (current best: cast params + activations)
  C. int8 x-side + bf16 recurrence  (static per-column W scales, dynamic
                                     per-tensor activation scale)
  D. full w8a8                     (C + per-step dynamic h quantization,
                                     int8 U dot, f32 gate math)
  E. full w8a8, bf16 gate math     (D with bf16 xp/nonlinearities)

Scaling scheme matches utils/quantize.py: symmetric per-output-column
weight scales; activations per-tensor dynamic (h is tanh-bounded so one
scale is tight).
"""
import numpy as np
import jax
import jax.numpy as jnp

from svd_lstm_tpu.bench.devtime import device_time_ms
from svd_lstm_tpu.models.lstm import (
    gate_update,
    init_stacked_lstm,
    stacked_lstm_apply,
)
from svd_lstm_tpu.utils.precision import cast_params
from svd_lstm_tpu.utils.quantize import quantize_tensor

B, T, d = 256, 128, 16
UNITS = (512, 512, 512)


def _quant_dynamic(x, axes=None):
    """Symmetric dynamic int8 quantization, per-tensor scale."""
    s = jnp.max(jnp.abs(x)) / 127.0
    s = jnp.maximum(s, 1e-12)
    q = jnp.clip(jnp.round(x / s), -127, 127).astype(jnp.int8)
    return q, s


def _dot_i8(qa, qb, sa, sb):
    """int8 x int8 -> int32 contraction on the last/first axes, scaled to f32."""
    acc = jax.lax.dot_general(
        qa, qb, (((qa.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return acc.astype(jnp.float32) * (sa * sb)


def int8_layer_apply(layer_q, x_seq, recurrence: str, gate_dtype):
    """One LSTM layer, x-side always int8; recurrence 'bf16' or 'int8'."""
    qW, sW, qU, sU, b, U = layer_q
    n = U.shape[0]
    Bsz = x_seq.shape[0]

    qx, sx = _quant_dynamic(x_seq)
    xp = _dot_i8(qx, qW, sx, sW) + b  # (B, T, 4n) f32
    xp = xp.astype(gate_dtype)
    xp_t = jnp.swapaxes(xp, 0, 1)

    h0 = jnp.zeros((Bsz, n), gate_dtype)
    c0 = jnp.zeros((Bsz, n), gate_dtype)

    if recurrence == "bf16":
        Ub = U.astype(jnp.bfloat16)

        def step(carry, xp_step):
            h, c = carry
            z = xp_step + (h.astype(jnp.bfloat16) @ Ub).astype(gate_dtype)
            h, c = gate_update(z, c)
            return (h, c), h

    else:  # int8 recurrence

        def step(carry, xp_step):
            h, c = carry
            qh, sh = _quant_dynamic(h.astype(jnp.float32))
            z = xp_step + _dot_i8(qh, qU, sh, sU).astype(gate_dtype)
            h, c = gate_update(z, c)
            return (h, c), h

    _, h_seq = jax.lax.scan(step, (h0, c0), xp_t)
    return jnp.swapaxes(h_seq, 0, 1)


def quantize_model(params):
    out = []
    for layer in params.layers:
        tW = quantize_tensor(layer.W)
        tU = quantize_tensor(layer.U)
        out.append((tW.q, tW.scale, tU.q, tU.scale, layer.b, layer.U))
    return tuple(out)


def int8_forward(qlayers, head, x_seq, recurrence, gate_dtype):
    h = x_seq.astype(gate_dtype)
    for layer_q in qlayers:
        h = int8_layer_apply(layer_q, h, recurrence, gate_dtype)
    return (h.astype(jnp.float32) @ head.w + head.b).astype(jnp.float32)


def main():
    rng = np.random.default_rng(0)
    params = init_stacked_lstm(jax.random.PRNGKey(0), input_dim=d, units=UNITS)
    x = jnp.asarray(rng.normal(size=(B, T, d)).astype(np.float32))
    qlayers = quantize_model(params)
    qlayers = jax.device_put(qlayers)

    f_exact = jax.jit(lambda p, xb: stacked_lstm_apply(p, xb, return_sequences=True))
    y_ref = np.asarray(f_exact(params, x))
    ref_norm = np.linalg.norm(y_ref)

    pbf = cast_params(params, jnp.bfloat16)
    f_bf16 = jax.jit(
        lambda p, xb: stacked_lstm_apply(p, xb, return_sequences=True).astype(
            jnp.float32
        )
    )
    xb16 = x.astype(jnp.bfloat16)

    variants = {
        "C int8-x + bf16 rec": jax.jit(
            lambda q, xb: int8_forward(q, params.head, xb, "bf16", jnp.bfloat16)
        ),
        "D w8a8, f32 gates": jax.jit(
            lambda q, xb: int8_forward(q, params.head, xb, "int8", jnp.float32)
        ),
        "E w8a8, bf16 gates": jax.jit(
            lambda q, xb: int8_forward(q, params.head, xb, "int8", jnp.bfloat16)
        ),
    }

    t_exact = device_time_ms(f_exact, params, x)
    print(f"A exact f32          : {t_exact:8.3f} ms   rel.err 0")
    y_bf = np.asarray(f_bf16(pbf, xb16))
    t_bf = device_time_ms(f_bf16, pbf, xb16)
    e_bf = np.linalg.norm(y_bf - y_ref) / ref_norm
    print(f"B bf16 fast          : {t_bf:8.3f} ms   rel.err {e_bf:.2e}   {t_exact / t_bf:.2f}x")

    for name, fn in variants.items():
        y = np.asarray(fn(qlayers, x))
        t = device_time_ms(fn, qlayers, x)
        e = np.linalg.norm(y - y_ref) / ref_norm
        print(f"{name:21s}: {t:8.3f} ms   rel.err {e:.2e}   {t_exact / t:.2f}x")


if __name__ == "__main__":
    main()
