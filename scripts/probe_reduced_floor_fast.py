"""Probe: FAST-MODE genuinely-factored kernels at the reference scale —
the one uncharted cell of the round-2 impossibility argument
(VERDICT r2 next #4).

probe_reduced_floor.py proved genuinely-factored two-step kernels lose
1.58–1.75× under EXACT (f32 3-pass) dot semantics at 4×40/4×30. Round 2
then found fast mode (single-pass DEFAULT-precision dots) halves the
dense chain cost (3.71 → 2.50 ms at 4×40/T=6656). Question: with the
per-dot cost halved, does the two-step's byte saving finally beat
dense-fast — i.e. is a sub-1.0 *fast-mode* ratio available at the
reference's own operating point?

Measures, per config (4×40, 4×30; r ∈ {16, 25}), all with
dot_precision="default":

* dense P-layout fused kernel        (the fast-mode dense bar)
* factored compact two-step kernel   (min streamed bytes)
* factored P-layout two-step kernel
* dense-reconstructed execution      (the current fast-mode ratio-1.0 path)

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_reduced_floor_fast.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import functools

import jax

from svd_lstm_tpu.factor.svd import make_reduced_model, make_singular_model
from svd_lstm_tpu.models.lstm import init_stacked_lstm
from svd_lstm_tpu.ops.layouts import reduced_forward_fused
from svd_lstm_tpu.ops.pallas_lstm import (
    fused_dense_stack_pallas,
    fused_reduced_stack_pallas,
)

from probe_reduced_floor import fused_reduced_stack_compact  # noqa: E402

T = 6656
FAST = "default"


def main():
    key = jax.random.PRNGKey(0)
    assert jax.devices()[0].platform != "cpu", "TPU probe"
    from svd_lstm_tpu.bench.devtime import device_time_ms

    for units in ((40,) * 4, (30,) * 4):
        dense = init_stacked_lstm(key, 16, units)
        x = jax.random.normal(jax.random.PRNGKey(1), (T, 16))
        d_fast = device_time_ms(
            jax.jit(functools.partial(
                fused_dense_stack_pallas, dense, layout="p", dot_precision=FAST
            )), x,
        )
        print(f"\n{len(units)}x{units[0]} T={T}: dense P fast {d_fast:.3f} ms")
        for r in (16, 25):
            if r > units[0]:
                continue
            rmodel = make_reduced_model(
                make_singular_model(dense, merged_kernel=True), rank=r
            )
            t_fc = device_time_ms(
                jax.jit(functools.partial(
                    fused_reduced_stack_compact, rmodel, dot_precision=FAST
                )), x,
            )
            t_fp = device_time_ms(
                jax.jit(functools.partial(
                    fused_reduced_stack_pallas, rmodel, dot_precision=FAST
                )), x,
            )
            t_rec = device_time_ms(
                jax.jit(functools.partial(
                    reduced_forward_fused, rmodel, dot_precision=FAST
                )), x,
            )
            print(
                f"  r={r:2d} fast: factored compact {t_fc:.3f} ms "
                f"({t_fc/d_fast:.2f}x) | factored P {t_fp:.3f} ms "
                f"({t_fp/d_fast:.2f}x) | dense-reconstructed {t_rec:.3f} ms "
                f"({t_rec/d_fast:.2f}x)"
            )


if __name__ == "__main__":
    main()
