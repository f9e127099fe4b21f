"""Probe: decompose the fused batch-1 kernel's per-step cost into
(fixed dependency-chain latency) + (streamed bytes / VMEM bandwidth).

Round 1 modeled the kernel against a single-component bandwidth roofline
(bench/roofline.py, 1700 GB/s "effective") and reported 64% of it. The
compact-gates probe falsified that model: halving the streamed bytes made
the kernel SLOWER, and 4x30 runs within ~6% of 4x40 despite 24% fewer
bytes. The right model at these scales is

    t_step = a_chain + bytes_streamed / BW_vmem

This probe measures the P-layout fused kernel at 4x{30,40,64,96} (same
T, same structure, increasing weight bytes) and least-squares fits
(a_chain, BW_vmem). The fit quality (printed residuals) is the evidence
that the model explains the measured time; a_chain is the part no byte
reduction can touch — it bounds every compression scheme's batch-1 win at
the reference scale.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_chain_decomposition.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import functools

import jax
import numpy as np

from svd_lstm_tpu.bench.roofline import dense_step_cost
from svd_lstm_tpu.models.lstm import init_stacked_lstm
from svd_lstm_tpu.ops.pallas_lstm import fused_dense_stack_pallas

CONFIGS = [(30,) * 4, (40,) * 4, (64,) * 4, (96,) * 4]
T = 6656


def main():
    if jax.devices()[0].platform == "cpu":
        print("needs TPU; printing byte table only")
        for units in CONFIGS:
            kb = dense_step_cost(16, units, layout="p").bytes_streamed / 1024
            print(f"  4x{units[0]}: {kb:.0f} KiB/step")
        return

    from svd_lstm_tpu.bench.devtime import device_time_ms

    key = jax.random.PRNGKey(0)
    rows = []
    for units in CONFIGS:
        params = init_stacked_lstm(key, 16, units)
        x = jax.random.normal(jax.random.PRNGKey(1), (T, 16))
        fn = jax.jit(functools.partial(fused_dense_stack_pallas, params, layout="p"))
        ms = device_time_ms(fn, x)
        ns = ms / T * 1e6
        kb = dense_step_cost(16, units, layout="p").bytes_streamed / 1024
        rows.append((units[0], kb, ns))
        print(f"4x{units[0]}: {ms:.3f} ms = {ns:.0f} ns/step, {kb:.0f} KiB/step")

    A = np.array([[1.0, kb * 1024] for _, kb, _ in rows])
    y = np.array([ns for _, _, ns in rows])
    (a_chain, inv_bw), *_ = np.linalg.lstsq(A, y, rcond=None)
    bw_tbps = 1e-3 / inv_bw if inv_bw > 0 else float("inf")
    print(f"\nfit: t_step = {a_chain:.0f} ns + bytes / {bw_tbps:.2f} TB/s")
    for n, kb, ns in rows:
        pred = a_chain + kb * 1024 * inv_bw
        print(f"  4x{n}: measured {ns:.0f} ns, model {pred:.0f} ns "
              f"({ns / pred * 100:.0f}% of model)")
    ref = next(ns for n, _, ns in rows if n == 40)
    print(f"\nchain share at the reference scale (4x40): "
          f"{a_chain / ref * 100:.0f}% of measured time")


if __name__ == "__main__":
    main()
