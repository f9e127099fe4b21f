"""Probe: batched-throughput Pallas recurrence with VMEM-resident U.

BENCH_NOTES' bf16 fast mode (3.32 ms at 3x512/B=256/T=128) runs the
recurrence as an XLA scan whose per-step (256,512)@(512,2048) dot measures
only ~97 GFLOP/ms (~50% of bf16 peak, probe_int8_matmul_raw.py) — the
2 MB bf16 weight matrix re-streams from HBM every step (2.5 us @ 800 GB/s
vs 2.7 us of MXU work, unoverlapped). A Pallas kernel holding U in VMEM
across all T steps removes that stream entirely; the projected bound is
~2.8 us/step -> ~1.1 ms recurrence + ~0.9 ms x-side = ~2 ms whole-model.

This is NOT the batch-1 fused kernel family (ops/pallas_lstm.py): batch
tiles are (256, 512) MXU-friendly blocks, and the bf16-in-kernel Mosaic
crash seen there (probe_precision.py) may not reproduce at these shapes.

Variants (single layer n=512, B=256, T=128, xp precomputed):
  A. XLA scan recurrence, bf16          (the round-1 fast path's core)
  B. Pallas, bf16 U resident            (CRASHES: bf16 dots hit the same
                                         Mosaic bug as probe_precision.py)
  C. Pallas, f32, package precision     (compiles; 3-pass f32 emulation,
                                         ~2.1 ms — slower than the scan)
  D. Pallas, f32 storage, dot precision=DEFAULT (THE WIN: single-pass
     bf16 multiply + f32 accumulate, 0.52 ms; 0.38 ms with bf16 xp
     streaming — integrated as ops/pallas_batched.py)

Bisect history (kept for the record): 3D blocks were not the problem;
a static multi-step unroll inside a multi-iteration grid crashes (ct>=2
AND grid>=2), each alone fine — hence one timestep per grid iteration.
"""
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from svd_lstm_tpu.bench.devtime import device_time_ms
from svd_lstm_tpu.models.lstm import gate_update, init_stacked_lstm, stacked_lstm_apply
from svd_lstm_tpu.utils.precision import cast_params

B, T, d = 256, 128, 16
N = 512


def scan_recurrence(xp, U):
    """xp: (T, B, 4n) in U.dtype; returns h_seq (T, B, n) f32."""
    n = U.shape[0]
    h0 = jnp.zeros((B, n), jnp.float32)
    c0 = jnp.zeros((B, n), jnp.float32)

    def step(carry, xp_t):
        h, c = carry
        z = (xp_t + (h.astype(U.dtype) @ U)).astype(jnp.float32)
        h, c = gate_update(z, c)
        return (h, c), h

    _, h_seq = jax.lax.scan(step, (h0, c0), xp)
    return h_seq


def pallas_batched_recurrence(xp, U, ct: int = 8, interpret: bool = False):
    """xp: (T, B, 4n) any float dtype; U: (n, 4n) bf16 or f32, VMEM-resident.
    Returns h_seq (T, B, n) in U.dtype. State carried in f32 scratch.

    2D formulation: time is flattened into rows ((T*B, 4n) blocks of
    ct*B rows), every in-kernel slice static — the repo's working kernels
    are all 2D and this avoids whatever 3D-block lowering path crashes the
    remote Mosaic helper."""
    Tt, Bb, g4 = xp.shape
    n = U.shape[0]
    assert g4 == 4 * n and Tt % ct == 0
    wdt = U.dtype
    xp2 = xp.reshape(Tt * Bb, g4)

    def kernel(xp_ref, u_ref, out_ref, h_scr, c_scr):
        @pl.when(pl.program_id(0) == 0)
        def _():
            h_scr[:] = jnp.zeros_like(h_scr)
            c_scr[:] = jnp.zeros_like(c_scr)

        for t in range(ct):
            z = (
                xp_ref[t * Bb : (t + 1) * Bb, :]
                + jnp.dot(h_scr[:].astype(wdt), u_ref[:],
                          preferred_element_type=jnp.float32)
            ).astype(jnp.float32)
            h, c = gate_update(z, c_scr[:])
            h_scr[:] = h
            c_scr[:] = c
            out_ref[t * Bb : (t + 1) * Bb, :] = h.astype(out_ref.dtype)

    out = pl.pallas_call(
        kernel,
        grid=(Tt // ct,),
        out_shape=jax.ShapeDtypeStruct((Tt * Bb, n), wdt),
        in_specs=[
            pl.BlockSpec((ct * Bb, g4), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ct * Bb, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((Bb, n), jnp.float32)] * 2,
        interpret=interpret,
    )(xp2, U)
    return out.reshape(Tt, Bb, n)


def main():
    rng = np.random.default_rng(0)
    U = jnp.asarray(rng.normal(size=(N, 4 * N)).astype(np.float32)) * 0.05
    xp = jnp.asarray(rng.normal(size=(T, B, 4 * N)).astype(np.float32))

    Ubf, xpbf = U.astype(jnp.bfloat16), xp.astype(jnp.bfloat16)

    f_scan = jax.jit(scan_recurrence)
    f_pal = jax.jit(functools.partial(pallas_batched_recurrence, ct=8))

    y_ref = np.asarray(f_scan(xp, U))
    nrm = np.linalg.norm(y_ref)

    t_scan_bf = device_time_ms(f_scan, xpbf, Ubf)
    print(f"A scan bf16   : {t_scan_bf:7.3f} ms")

    for name, (a, u) in {
        "B pallas bf16": (xpbf, Ubf),
        "C pallas f32 ": (xp, U),
    }.items():
        try:
            y = np.asarray(f_pal(a, u)).astype(np.float32)
        except Exception as e:  # Mosaic compile failures are the known risk
            print(f"{name}: FAILED — {type(e).__name__}: {str(e)[:200]}")
            continue
        t = device_time_ms(f_pal, a, u)
        err = np.linalg.norm(y - y_ref) / nrm
        print(f"{name}: {t:7.3f} ms   rel.err {err:.2e}   vs scan {t_scan_bf / t:.2f}x")

    # D: the integrated kernel (f32 weights + precision=DEFAULT dot + bf16
    # xp streaming) — the recipe that survived the bisect
    from svd_lstm_tpu.ops.pallas_batched import batched_lstm_recurrence_pallas

    xp3 = xp.reshape(T, B, 4 * N)
    f_d = jax.jit(functools.partial(batched_lstm_recurrence_pallas, bt=B))
    y = np.asarray(f_d(xp3.astype(jnp.bfloat16), U)).astype(np.float32)
    t = device_time_ms(f_d, xp3.astype(jnp.bfloat16), U)
    err = np.linalg.norm(y - y_ref.reshape(T, B, N)) / nrm
    print(f"D pallas DEFAULT-prec bf16-xp: {t:7.3f} ms   rel.err {err:.2e}   vs scan {t_scan_bf / t:.2f}x")


if __name__ == "__main__":
    main()
