"""Probe: packed split two-step recurrence for wide models.

Split factorization at rank r per gate has sum(r_g) = 4r; at r=32 (the
r=n/16 operating point for n=512) the four B factors pack into EXACTLY one
128-lane block: ONE dot h@Ball computes every gate's low-rank projection.
Second stage stays per-gate with row-compact [I|C] (r, npg) — total weight
streaming ~0.5 MB/layer-step vs 1.3 MB for the merged rank-128-padded form
and 4 MB dense.

Variants (batch-1, whole-run T=6656, 3x512, split rank 32):
  V0 current split path: dense-reconstructed recurrence (api default)
  Vm merged-factorization hybrid (the 10.46 ms BENCH_NOTES reference point)
  V1 packed Ball + 4 per-gate IC dots (unaligned static hb slices)
  V2 packed Ball + single block-diagonal IC dot (aligned, more streaming)
"""
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import svd_lstm_tpu as st
from svd_lstm_tpu.bench.devtime import device_time_ms
from svd_lstm_tpu.models.lstm import init_stacked_lstm, stacked_lstm_apply
from svd_lstm_tpu.models.reduced import reduced_lstm_apply, reduced_projection
from svd_lstm_tpu.ops.pallas_lstm import (
    LANE, DEFAULT_CT, _ceil_to, _gates_p, _dot, reduced_forward_hybrid,
)
from svd_lstm_tpu.ops.layouts import reduced_forward_dense_recurrent
from svd_lstm_tpu.utils.linalg import fold_IC, pad_cols, pad_gate_cols

T = 6656
d = 16
UNITS = (512, 512, 512)
RANK = 32


def packed_split_recurrence(xp, uB, uC, blockdiag=False, ct=DEFAULT_CT, interpret=False):
    """Split-mode low-rank h recurrence with all gates' B packed into one dot.

    xp: (T, 4n) input projection incl. bias; uB/uC: 4-tuples.
    """
    T, g4 = xp.shape
    n = g4 // 4
    npg = _ceil_to(n, LANE)
    ranks = tuple(B.shape[1] for B in uB)
    offs = tuple(int(np.cumsum((0,) + ranks)[g]) for g in range(4))
    R = sum(ranks)
    Rp = _ceil_to(R, LANE)

    Ball = jnp.concatenate(list(uB), axis=1)  # (n, R)
    Ball = pad_cols(Ball, Rp)
    ICs = [fold_IC(uB[g], uC[g]) for g in range(4)]  # (r_g, n)

    if blockdiag:
        ICpack = jnp.zeros((Rp, 4 * npg), jnp.float32)
        for g in range(4):
            ICpack = jax.lax.dynamic_update_slice(ICpack, ICs[g], (offs[g], g * npg))
        weights = [Ball, ICpack]
    else:
        weights = [Ball] + [pad_cols(ic, npg) for ic in ICs]

    xp_p = pad_gate_cols(xp, n, npg)
    CT = min(ct, _ceil_to(T, 8))
    Tp = _ceil_to(T, CT)
    if Tp != T:
        xp_p = jnp.concatenate([xp_p, jnp.zeros((Tp - T, 4 * npg), xp_p.dtype)], axis=0)

    nw = len(weights)

    def kernel(xp_ref, *refs):
        w_refs = refs[:nw]
        out_ref = refs[nw]
        h_scr, c_scr, z_scr = refs[nw + 1], refs[nw + 2], refs[nw + 3]

        @pl.when(pl.program_id(0) == 0)
        def _():
            h_scr[:] = jnp.zeros_like(h_scr)
            c_scr[:] = jnp.zeros_like(c_scr)

        def body(t, _):
            hb = _dot(h_scr[:, :n], w_refs[0][:])  # (1, Rp) all gates at once
            if blockdiag:
                z = _dot(hb, w_refs[1][:]) + xp_ref[pl.ds(t, 1), :]
            else:
                for g in range(4):
                    z_scr[:, g * npg : (g + 1) * npg] = _dot(
                        hb[:, offs[g] : offs[g] + ranks[g]], w_refs[1 + g][:]
                    )
                z = z_scr[:] + xp_ref[pl.ds(t, 1), :]
            h, c = _gates_p(z, c_scr[:], npg)
            h_scr[:] = h
            c_scr[:] = c
            out_ref[pl.ds(t, 1), :] = h
            return 0

        jax.lax.fori_loop(0, CT, body, 0)

    h_seq = pl.pallas_call(
        kernel,
        grid=(Tp // CT,),
        out_shape=jax.ShapeDtypeStruct((Tp, npg), jnp.float32),
        in_specs=[pl.BlockSpec((CT, 4 * npg), lambda i: (i, 0), memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * nw,
        out_specs=pl.BlockSpec((CT, npg), lambda i: (i, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((1, npg), jnp.float32),
            pltpu.VMEM((1, npg), jnp.float32),
            pltpu.VMEM((1, 4 * npg), jnp.float32),
        ],
        interpret=interpret,
    )(xp_p, *weights)
    return h_seq[:T, :n]


def packed_split_forward(params, x, blockdiag=False, interpret=False):
    h = x
    for l in params.layers:
        xp = reduced_projection(l, h, "w") + l.b
        h = packed_split_recurrence(
            xp, tuple(l.uB), tuple(l.uC), blockdiag=blockdiag, interpret=interpret
        )
    return h @ params.head.w + params.head.b


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    x1 = jnp.asarray(rng.normal(size=(T, d)), jnp.float32)

    params = init_stacked_lstm(jax.random.PRNGKey(0), d, UNITS)
    s_split = st.make_singular_model(params, merged_kernel=False)
    r_split = st.make_reduced_model(s_split, rank=RANK)
    s_merged = st.make_singular_model(params, merged_kernel=True)
    r_merged = st.make_reduced_model(s_merged, rank=RANK)

    ref_split = jax.jit(
        lambda p, xx: reduced_lstm_apply(p, xx[None], return_sequences=True)[0]
    )(r_split, x1)
    sig = float(jnp.abs(ref_split).max())

    fns = {
        "V0 split dense-recon": jax.jit(
            lambda p, xx: reduced_forward_dense_recurrent(p, xx[None], return_sequences=True)[0]
        ),
        "V1 packed per-gate  ": jax.jit(lambda p, xx: packed_split_forward(p, xx)),
        "V2 packed blockdiag ": jax.jit(lambda p, xx: packed_split_forward(p, xx, blockdiag=True)),
    }
    for name, fn in fns.items():
        try:
            err = float(jnp.abs(fn(r_split, x1) - ref_split).max()) / sig
            ms = device_time_ms(fn, r_split, x1, repeats=3)
            print(f"{name} {ms:8.3f} ms  ({ms*1e3/T:6.3f} us/step)  rel.err {err:.2e}")
        except Exception as e:
            print(f"{name} FAILED: {str(e)[:200]}".replace("\n", " "))

    fm = jax.jit(reduced_forward_hybrid)
    ms = device_time_ms(fm, r_merged, x1, repeats=3)
    print(f"Vm merged hybrid     {ms:8.3f} ms  ({ms*1e3/T:6.3f} us/step)  [merged factorization]")

    scan = jax.jit(lambda p, xx: stacked_lstm_apply(p, xx[None], return_sequences=True)[0])
    ms = device_time_ms(scan, params, x1, repeats=3)
    print(f"dense scan           {ms:8.3f} ms  ({ms*1e3/T:6.3f} us/step)  [uncompressed]")


if __name__ == "__main__":
    main()
