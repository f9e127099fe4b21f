"""Probe: compact-gate ("C-layout") fused dense stack kernel.

VERDICT.md round-1 weak #4: the headline fused kernel (P-layout, each gate
padded to its own 128-lane block) measured 3.71 ms at 4x40/T=6656 = 64% of
its VMEM-streaming roofline. But the P-layout roofline itself is not the
hardware floor: at n=40 only 160 of 512 weight lanes are live. This probe
packs gates into as few 128-lane blocks as possible:

* pair layout  (n <= 64):  [i|g] in block 0, [f|o] in block 1  -> 2 blocks
* quad layout  (n <= 32):  [i|g|f|o] in one block              -> 1 block

halving (n=40) / quartering (n=30) the streamed weight bytes. Gate
extraction, the reason round 1 kept the P-layout ("fully-compact columns
cost 2.5x in unaligned gate extraction"), is done here WITHOUT unaligned
lane slices: nonlinearities are computed on whole aligned blocks and the
g/f/o gates are aligned to lane 0 by static intra-block `pltpu.roll`,
which Mosaic lowers to a lane rotate.

Measures on TPU (4x40 and 4x30, T=6656, batch-1):
  baseline   fused_dense_stack_pallas (P-layout, 16x unroll)
  compact    this kernel, same unroll

Numerics are gated against the P-layout kernel output first (CPU
interpret + on-TPU compare).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_compact_gates.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import functools

import jax
import jax.numpy as jnp

from svd_lstm_tpu.models.lstm import init_stacked_lstm
from svd_lstm_tpu.ops.pallas_lstm import fused_dense_stack_pallas


def main():
    on_cpu = jax.devices()[0].platform == "cpu"
    key = jax.random.PRNGKey(0)

    if on_cpu:
        print("CPU: interpret-mode numerics only")
        for units in ((40, 40, 40, 40), (30, 30, 30, 30), (15, 15, 15), (40, 30, 15)):
            params = init_stacked_lstm(key, 16, units)
            x = jax.random.normal(jax.random.PRNGKey(1), (96, 16))
            ref = fused_dense_stack_pallas(params, x, interpret=True, layout="p")
            got = fused_dense_stack_pallas(params, x, interpret=True, layout="compact")
            err = float(jnp.abs(ref - got).max())
            print(f"  units={units}: max|err| compact vs P = {err:.2e}")
            assert err < 1e-5, err
        print("NUMERICS OK")
        return

    from svd_lstm_tpu.bench.devtime import device_time_ms

    T = 6656
    for units in ((40, 40, 40, 40), (30, 30, 30, 30)):
        params = init_stacked_lstm(key, 16, units)
        x = jax.random.normal(jax.random.PRNGKey(1), (T, 16))

        base_fn = jax.jit(functools.partial(fused_dense_stack_pallas, params, layout="p"))
        comp_fn = jax.jit(functools.partial(fused_dense_stack_pallas, params, layout="compact"))

        err = float(jnp.abs(base_fn(x) - comp_fn(x)).max())
        print(f"units={units}: max|err| = {err:.2e}")
        assert err < 1e-4, err

        t_base = device_time_ms(base_fn, x)
        t_comp = device_time_ms(comp_fn, x)
        print(
            f"units={units} T={T}: P-layout {t_base:.3f} ms | "
            f"compact {t_comp:.3f} ms | speedup {t_base / t_comp:.2f}x | "
            f"{t_comp / T * 1e6:.0f} ns/step"
        )


if __name__ == "__main__":
    main()
