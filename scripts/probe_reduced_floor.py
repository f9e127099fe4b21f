"""Probe: can a genuinely-factored kernel beat the dense kernel at the
reference's own operating point (4x40, batch-1)? — VERDICT round-1 item 4.

Analytic tile accounting (svd_lstm_tpu.bench.roofline, C-layout aware):
the kernels are VMEM-streaming-bound, and VMEM granularity is an
(8 sublane x 128 lane) f32 tile. Per layer-step, recurrent side only:

    n=40: dense-compact U (40, 256)          -> 10 tiles
          reduced  B (40, r<=128) + [I|C]    ->  5 + 2*ceil(r/8) tiles
          => fewer bytes than dense ONLY for r <= 16, max saving 10% (r=16)
    n=30: dense-compact U (30, 128)          ->  4 tiles
          reduced  B (30, r) + [I|C]         ->  4 + ceil(r/8) >= 5 tiles
          => strictly MORE bytes for EVERY rank

while the second dependent dot costs ~+30% chain latency (round-1
measurement, BENCH_NOTES "recurrence form" table). A >=30% latency cost
against a <=10% (n=40) or negative (n=30) byte saving means the two-step
recurrence cannot win at the reference scale on this hardware; the fastest
exact execution of the truncated model is dense reconstruction — which is
what predict()/reduced_forward_fused do.

This probe measures it anyway (fused whole-stack, both layouts, genuinely
factored vs dense-reconstructed) so the claim is backed by device time,
not only the model.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_reduced_floor.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from svd_lstm_tpu.bench.roofline import dense_step_cost, reduced_step_cost
from svd_lstm_tpu.factor.svd import make_reduced_model, make_singular_model
from svd_lstm_tpu.models.lstm import init_stacked_lstm
from svd_lstm_tpu.models.reduced import reduced_lstm_apply
from svd_lstm_tpu.ops.layouts import reduced_forward_fused
from svd_lstm_tpu.ops.pallas_lstm import (
    DEFAULT_CT,
    DEFAULT_UNROLL,
    LANE,
    _ceil_to,
    _dot,
    _gates_compact,
    _time_loop,
    fused_dense_stack_pallas,
    fused_reduced_stack_pallas,
)
from svd_lstm_tpu.utils.linalg import (
    fold_IC,
    gate_group_size,
    pack_gate_cols_compact,
    pad_cols,
)


def fused_reduced_stack_compact(
    params,
    x,
    ct: int = DEFAULT_CT,
    interpret: bool = False,
    unroll: int = DEFAULT_UNROLL,
    dot_precision=None,
):
    """Genuinely-factored merged two-step whole-stack kernel in the compact
    gate layout: per layer and side, z += (v @ B)[:, :r] @ [I|C]_compact.
    The best case for a factored kernel at small n — minimal streamed bytes
    ([I|C] gate columns packed 2-4 per lane block, B rank-padded once)."""
    T, d = x.shape
    layers = params.layers
    units = [l.units for l in layers]
    L = len(layers)
    ks = [gate_group_size(n) for n in units]
    assert all(k > 1 for k in ks) and not any(l.split for l in layers)
    zws = [(4 // k) * LANE for k in ks]
    dp = _ceil_to(d, LANE)

    from svd_lstm_tpu.ops.pallas_lstm import _resolve_dot_precision

    prec = _resolve_dot_precision(dot_precision)
    x_p = pad_cols(x, dp)
    weights = []
    ranks = []
    for i, l in enumerate(layers):
        n, k = units[i], ks[i]
        ranks.append((l.wB.shape[1], l.uB.shape[1]))
        weights.append(pad_cols(l.wB, _ceil_to(l.wB.shape[1], LANE)))
        weights.append(pack_gate_cols_compact(fold_IC(l.wB, l.wC), n, k))
        weights.append(pad_cols(l.uB, _ceil_to(l.uB.shape[1], LANE)))
        weights.append(pack_gate_cols_compact(fold_IC(l.uB, l.uC), n, k))
        weights.append(pack_gate_cols_compact(l.b.reshape(1, -1), n, k))

    CT = min(ct, _ceil_to(T, 8))
    Tp = _ceil_to(T, CT)
    if Tp != T:
        x_p = jnp.concatenate([x_p, jnp.zeros((Tp - T, dp), x_p.dtype)], axis=0)

    def kernel(x_ref, *refs):
        w_refs = refs[: 5 * L]
        out_ref = refs[5 * L]
        scr = refs[5 * L + 1 :]

        @pl.when(pl.program_id(0) == 0)
        def _():
            for s in scr:
                s[:] = jnp.zeros_like(s)

        def step(t):
            inp = x_ref[pl.ds(t, 1), :d]
            for i in range(L):
                rw, ru = ranks[i]
                xb = _dot(inp, w_refs[5 * i][:], prec)
                zx = _dot(xb[:, :rw], w_refs[5 * i + 1][:], prec)
                hb = _dot(scr[2 * i][:, : units[i]], w_refs[5 * i + 2][:], prec)
                zu = _dot(hb[:, :ru], w_refs[5 * i + 3][:], prec)
                z = zx + zu + w_refs[5 * i + 4][:]
                h, c = _gates_compact(z, scr[2 * i + 1][:], units[i], ks[i], interpret)
                scr[2 * i][:] = h
                scr[2 * i + 1][:] = c
                inp = h[:, : units[i]]
            out_ref[pl.ds(t, 1), :] = scr[2 * (L - 1)][:]

        _time_loop(step, CT, unroll)

    scratch = []
    for _ in units:
        scratch += [pltpu.VMEM((1, LANE), jnp.float32)] * 2

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


def tile_table():
    print("analytic per-step streamed KiB (recurrent+input sides, whole stack):")
    for units, d in (((40,) * 4, 16), ((30,) * 4, 16)):
        dc = dense_step_cost(d, units, layout="compact").bytes_streamed / 1024
        dpp = dense_step_cost(d, units, layout="p").bytes_streamed / 1024
        print(f"  {len(units)}x{units[0]}: dense P {dpp:.0f} | dense compact {dc:.0f}")
        for r in (8, 16, 24, 32):
            rc = reduced_step_cost(
                d, units, [r] * len(units), merged=True, layout="compact"
            ).bytes_streamed / 1024
            print(f"    merged r={r:2d} compact two-step: {rc:.0f} KiB")


def main():
    tile_table()
    key = jax.random.PRNGKey(0)
    on_cpu = jax.devices()[0].platform == "cpu"

    if on_cpu:
        print("\nCPU: numerics only")
        for units in ((40, 40), (30, 30)):
            dense = init_stacked_lstm(key, 16, units)
            rmodel = make_reduced_model(
                make_singular_model(dense, merged_kernel=True), rank=16
            )
            x = jax.random.normal(jax.random.PRNGKey(1), (64, 16))
            ref = reduced_lstm_apply(rmodel, x[None])[0]
            got = fused_reduced_stack_compact(rmodel, x, interpret=True)
            err = float(jnp.abs(ref - got).max())
            print(f"  units={units}: compact-reduced max|err| = {err:.2e}")
            assert err < 5e-5, err
        print("NUMERICS OK")
        return

    from svd_lstm_tpu.bench.devtime import device_time_ms

    T = 6656
    for units in ((40,) * 4, (30,) * 4):
        dense = init_stacked_lstm(key, 16, units)
        x = jax.random.normal(jax.random.PRNGKey(1), (T, 16))
        d_comp = device_time_ms(
            jax.jit(functools.partial(fused_dense_stack_pallas, dense, layout="p")), x
        )
        print(f"\n{len(units)}x{units[0]} T={T}: dense P-layout {d_comp:.3f} ms")
        for r in (16, 25):
            if r > units[0]:
                continue
            rmodel = make_reduced_model(
                make_singular_model(dense, merged_kernel=True), rank=r
            )
            t_fact_c = device_time_ms(
                jax.jit(functools.partial(fused_reduced_stack_compact, rmodel)), x
            )
            t_fact_p = device_time_ms(
                jax.jit(functools.partial(fused_reduced_stack_pallas, rmodel)), x
            )
            t_recon = device_time_ms(
                jax.jit(functools.partial(reduced_forward_fused, rmodel)), x
            )
            print(
                f"  r={r:2d}: factored compact {t_fact_c:.3f} ms "
                f"({t_fact_c/d_comp:.2f}x) | factored P {t_fact_p:.3f} ms "
                f"({t_fact_p/d_comp:.2f}x) | dense-reconstructed {t_recon:.3f} ms "
                f"({t_recon/d_comp:.2f}x)"
            )


if __name__ == "__main__":
    main()
