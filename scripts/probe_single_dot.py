"""Probe: single-dot-per-layer fused dense kernel ([x|h] @ [W;U]).

The compact-gates probe established that the fused batch-1 kernel at the
reference scale is latency-CHAIN-bound, not streaming-bound (P-layout 4x30
= 3.46 ms vs 4x40 = 3.66 ms despite 24% fewer bytes; the 2x-fewer-byte
compact layout is SLOWER). Two-point fit: ~390 ns/step fixed chain cost +
bytes at ~3.7 TB/s. The fixed cost is dominated by 8 MXU issues + 4 VPU
gate rounds per step.

This probe halves the MXU issue count: each layer's two matvecs
(x@W + h@U) become ONE dot v @ [W;U] with v = [input | h] packed in a
single 128-lane vector. Maintaining v costs one static lane-roll
(h -> lanes [d, d+n)) plus one select per layer — VPU lane ops measured at
~15 ns each, vs ~50 ns per saved MXU issue.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_single_dot.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from svd_lstm_tpu.models.lstm import init_stacked_lstm
from svd_lstm_tpu.ops.pallas_lstm import (
    DEFAULT_CT,
    DEFAULT_UNROLL,
    LANE,
    _ceil_to,
    _dot,
    _gates_p,
    _roll,
    _time_loop,
    fused_dense_stack_pallas,
)
from svd_lstm_tpu.utils.linalg import pad_cols, pad_gate_cols


def fused_dense_stack_single_dot(
    params,
    x,
    ct: int = DEFAULT_CT,
    interpret: bool = False,
    unroll: int = DEFAULT_UNROLL,
):
    """One MXU issue per layer-step: z = v @ [W;U] + b with v = [inp|h]
    held in one 128-lane scratch vector per layer. Requires d+n <= 128."""
    T, d = x.shape
    units = [l.units for l in params.layers]
    L = len(units)
    npgs = [_ceil_to(n, LANE) for n in units]
    dims = [d] + units[:-1]  # input dim per layer
    assert all(dims[i] + units[i] <= LANE for i in range(L))
    dp = _ceil_to(d, LANE)

    x_p = pad_cols(x, dp)
    weights = []
    for i, l in enumerate(params.layers):
        WU = jnp.concatenate([l.W, l.U], axis=0)  # (d_i + n_i, 4n)
        weights.append(pad_gate_cols(WU, units[i], npgs[i]))
        weights.append(pad_gate_cols(l.b.reshape(1, -1), units[i], npgs[i]))

    CT = min(ct, _ceil_to(T, 8))
    Tp = _ceil_to(T, CT)
    if Tp != T:
        x_p = jnp.concatenate([x_p, jnp.zeros((Tp - T, dp), x_p.dtype)], axis=0)

    def kernel(x_ref, *refs):
        lane_idx = jax.lax.broadcasted_iota(jnp.int32, (1, LANE), 1)
        w_refs = refs[: 2 * L]
        out_ref = refs[2 * L]
        scr = refs[2 * L + 1 :]  # per layer: v (1, LANE), c (1, npg)

        @pl.when(pl.program_id(0) == 0)
        def _():
            for s in scr:
                s[:] = jnp.zeros_like(s)

        def step(t):
            inp_row = x_ref[pl.ds(t, 1), :]  # (1, dp=LANE), x at lanes [0, d)
            for i in range(L):
                d_i, n_i = dims[i], units[i]
                # v = [inp(t) | h(t-1)]: the scratch holds h(t-1) pre-rolled
                # to lanes [d_i, d_i+n_i); refresh the input lanes.
                v = jnp.where(lane_idx < d_i, inp_row[:, :LANE], scr[2 * i][:])
                z = _dot(v[:, : d_i + n_i], w_refs[2 * i][:]) + w_refs[2 * i + 1][:]
                h, c = _gates_p(z, scr[2 * i + 1][:], npgs[i])
                scr[2 * i + 1][:] = c
                h_blk = h[:, :LANE]
                scr[2 * i][:] = _roll(h_blk, d_i, interpret)
                inp_row = h_blk  # next layer's input, already at lanes [0, n)
            out_ref[pl.ds(t, 1), :] = inp_row

        _time_loop(step, CT, unroll)

    scratch = []
    for npg in npgs:
        scratch += [pltpu.VMEM((1, LANE), jnp.float32), pltpu.VMEM((1, npg), jnp.float32)]

    h_seq = pl.pallas_call(
        kernel,
        grid=(Tp // CT,),
        out_shape=jax.ShapeDtypeStruct((Tp, LANE), jnp.float32),
        in_specs=[pl.BlockSpec((CT, dp), lambda i: (i, 0), memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(weights),
        out_specs=pl.BlockSpec((CT, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
        interpret=interpret,
    )(x_p, *weights)
    h_seq = h_seq[:T, : units[-1]]
    return h_seq @ params.head.w + params.head.b


def main():
    on_cpu = jax.devices()[0].platform == "cpu"
    key = jax.random.PRNGKey(0)

    if on_cpu:
        print("CPU: interpret-mode numerics only")
        for units in ((40, 40, 40, 40), (30, 30, 30, 30), (15, 15, 15)):
            params = init_stacked_lstm(key, 16, units)
            x = jax.random.normal(jax.random.PRNGKey(1), (96, 16))
            ref = fused_dense_stack_pallas(params, x, interpret=True, layout="p")
            got = fused_dense_stack_single_dot(params, x, interpret=True)
            err = float(jnp.abs(ref - got).max())
            print(f"  units={units}: max|err| = {err:.2e}")
            assert err < 1e-5, err
        print("NUMERICS OK")
        return

    from svd_lstm_tpu.bench.devtime import device_time_ms

    T = 6656
    for units in ((40, 40, 40, 40), (30, 30, 30, 30)):
        params = init_stacked_lstm(key, 16, units)
        x = jax.random.normal(jax.random.PRNGKey(1), (T, 16))

        base_fn = jax.jit(
            functools.partial(fused_dense_stack_pallas, params, layout="p")
        )
        sd_fn = jax.jit(functools.partial(fused_dense_stack_single_dot, params))

        err = float(jnp.abs(base_fn(x) - sd_fn(x)).max())
        print(f"units={units}: max|err| = {err:.2e}")
        assert err < 1e-4, err

        t_base = device_time_ms(base_fn, x)
        t_sd = device_time_ms(sd_fn, x)
        print(
            f"units={units} T={T}: two-dot {t_base:.3f} ms | "
            f"single-dot {t_sd:.3f} ms | speedup {t_base / t_sd:.2f}x | "
            f"{t_sd / T * 1e6:.0f} ns/step"
        )


if __name__ == "__main__":
    main()
