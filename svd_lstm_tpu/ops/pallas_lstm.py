"""Pallas TPU kernels for the LSTM recurrence — the component the reference
could not deliver: its compressed model ran ~1.3× SLOWER in Python/Keras
(reference plots/timing_plot.png, slide 15). Here the whole sequential
recurrence runs inside one kernel with the recurrent weights and the (h, c)
state resident in VMEM across the entire sequence.

Layout ("P-layout"): every gate is padded to its own 128-lane-aligned block.

* state h, c: (1, NP) with NP = ceil(n/128)*128 — only the first n lanes are
  live;
* gate pre-activations z: (1, 4*NPg) with gate g in lanes
  [g*NPg, g*NPg + n) — so the i/f/g/o extraction is a tile-aligned lane
  slice. Mosaic handles unaligned lane slices combined with dynamic row
  reads pathologically (~1000× measured on v5e); alignment avoids it.

The time axis streams through the kernel in CT-step chunks via the Pallas
grid (TPU grids execute sequentially on a core, so VMEM scratch carries the
recurrent state across chunks and input/output blocks are double-buffered
against HBM automatically).

Reduced (low-rank) recurrence uses the folded two-step form: the exact
two-step product z = [hB, (hB)·C] equals (h·B)·[I|C] with [I|C] precomputed
(reference two-step: code/svd_classes_v3.py:317-328; the fold is exact and
removes all in-kernel concatenation). Column order is preserved, so gate
extraction is unchanged.

All kernels are batch-1 (the latency path the reference benchmarks,
code/svd_acceleration_v3.py:147-152, and the LabVIEW real-time deployment
targets); batched throughput inference uses the XLA scan path, which the
MXU serves well at large batch.
"""

from __future__ import annotations

import contextlib
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from svd_lstm_tpu.models.lstm import StackedLSTMParams, gate_update
from svd_lstm_tpu.models.reduced import ReducedModelParams

from svd_lstm_tpu.utils.linalg import (
    LANE,
    ceil_to,
    fold_IC,
    gate_group_size,
    pack_gate_cols_compact,
    pad_cols,
    pad_gate_cols,
)

DEFAULT_CT = 512
# Time-loop unroll factor: amortizes per-step loop management in the
# sequential recurrence. Measured at the headline point (4×40, T=6656,
# batch-1): 4.42 ms unrolled=1 → 3.71 ms at 16 (knee; 32 is 3.69 ms at 2×
# the compile time) — scripts/probe_unroll.py.
DEFAULT_UNROLL = 16


_ceil_to = ceil_to  # canonical helper lives in utils.linalg


def _time_loop(step, CT: int, unroll: int) -> None:
    """Run ``step(t)`` for t in [0, CT) as a fori_loop unrolled ``unroll``×
    (clamped to a divisor of CT, which is always a multiple of 8)."""
    u = max(1, min(unroll, CT))
    while CT % u:
        u //= 2

    def body(j, _):
        for k in range(u):
            step(j * u + k)
        return 0

    jax.lax.fori_loop(0, CT // u, body, 0)


# ---------------------------------------------------------------------------
# kernel bodies
# ---------------------------------------------------------------------------

def _gates_p(z: jax.Array, c: jax.Array, npg: int) -> Tuple[jax.Array, jax.Array]:
    """P-layout gate update: z (rows, 4*npg), c (rows, npg).

    ONE source of truth for the cell math: delegates to
    ``models.lstm.gate_update`` (which the XLA scan reference and the
    training kernels also use), so the kernels cannot silently diverge
    from the scan they are tested against. ``npg`` is kept as a layout
    assertion — in the P-layout the gate stride IS the state width."""
    assert npg == c.shape[-1], (npg, c.shape)
    return gate_update(z, c)


def _roll(v: jax.Array, shift: int, interpret: bool) -> jax.Array:
    """Static lane roll. Compiled TPU path uses the Mosaic lane rotate;
    interpret mode falls back to jnp.roll (identical semantics)."""
    if interpret:
        return jnp.roll(v, shift, axis=1)
    return pltpu.roll(v, shift=shift % LANE, axis=1)


def _gates_compact(
    z: jax.Array, c: jax.Array, n: int, k: int, interpret: bool
) -> Tuple[jax.Array, jax.Array]:
    """Gate math in the compact ("C") layout — k gates per 128-lane block
    (pack_gate_cols_compact order). z: (1, (4//k)*128); c: (1, 128) with
    live lanes [0, n). Nonlinearities run on whole aligned blocks and g/f/o
    are aligned to lane 0 by static intra-block rolls, so no unaligned lane
    slices ever reach Mosaic (the round-1 ~2.5× extraction penalty).
    Lanes >= n carry bounded garbage (sigmoid/tanh of zero-padded weights);
    callers slice h to its live lanes before every use."""
    if k == 4:
        zb = z[:, :LANE]
        s = jax.nn.sigmoid(zb)
        i = s
        g = _roll(jnp.tanh(zb), -n, interpret)
        f = _roll(s, -2 * n, interpret)
        o = _roll(s, -3 * n, interpret)
    else:  # k == 2: block 0 = [i|g], block 1 = [f|o]
        i = jax.nn.sigmoid(z[:, :LANE])
        g = _roll(jnp.tanh(z[:, :LANE]), -n, interpret)
        f = jax.nn.sigmoid(z[:, LANE : 2 * LANE])
        o = _roll(f, -n, interpret)
    c_new = f * c + i * g
    return o * jnp.tanh(c_new), c_new


def _dot(a, b, precision=None):
    return jnp.dot(a, b, preferred_element_type=jnp.float32, precision=precision)


def _bad_dot_precision(value):
    raise ValueError(
        f"unknown dot_precision {value!r}; expected None, 'default', "
        "'highest', or a jax.lax.Precision"
    )


def _resolve_dot_precision(dot_precision):
    """None -> inherit the package default (f32-forced passes: exact);
    'default' -> single-pass bf16 multiply with f32 accumulation — the
    batch-1 "fast" mode. Measured (scripts/probe_wide_default_precision.py,
    batch-1 T=6656): the f32-forced 3-pass emulation is NOT free even in
    the chain-bound regime — fused 4×40 drops 3.71 -> 2.50 ms and the wide
    reduced hybrid 9.83 -> 5.40 ms at ~6e-3 rel.err under 'default'."""
    if dot_precision is None:
        return None
    if isinstance(dot_precision, jax.lax.Precision):
        return dot_precision
    table = {
        "default": jax.lax.Precision.DEFAULT,
        "highest": jax.lax.Precision.HIGHEST,
    }
    if dot_precision not in table:
        _bad_dot_precision(dot_precision)
    return table[dot_precision]


def _pad_state(s: jax.Array | None, n: int, npg: int) -> jax.Array:
    """(1, n) or None -> (1, npg)."""
    if s is None:
        return jnp.zeros((1, npg), jnp.float32)
    return pad_cols(s.reshape(1, n).astype(jnp.float32), npg)


def _recurrence_call(kernel, T: int, CT: int, npg: int, weights, xp, scratch, interpret):
    """Common pallas_call plumbing: xp (T,4npg) streamed in CT chunks, h_seq
    (T, npg) streamed out, `weights` (incl. initial state) resident, state
    scratch persisting across the sequential grid."""
    Tp = _ceil_to(T, CT)
    if Tp != T:
        xp = jnp.concatenate([xp, jnp.zeros((Tp - T, xp.shape[1]), xp.dtype)], axis=0)
    out = pl.pallas_call(
        kernel,
        grid=(Tp // CT,),
        out_shape=jax.ShapeDtypeStruct((Tp, npg), jnp.float32),
        in_specs=[pl.BlockSpec((CT, 4 * npg), lambda i: (i, 0), memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(weights),
        out_specs=pl.BlockSpec((CT, npg), lambda i: (i, 0), memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
        interpret=interpret,
    )(xp, *weights)
    return out[:T]


# ---------------------------------------------------------------------------
# single-layer recurrence (consumes hoisted input projection)
# ---------------------------------------------------------------------------

def lstm_recurrence_pallas(
    xp: jax.Array,  # (T, 4n) input projection incl. bias (unpadded layout)
    U: jax.Array,   # (n, 4n)
    h0: jax.Array | None = None,
    c0: jax.Array | None = None,
    ct: int = DEFAULT_CT,
    interpret: bool = False,
    unroll: int = DEFAULT_UNROLL,
    dot_precision=None,
    weights_bf16: bool = False,
) -> jax.Array:
    """Dense h-side recurrence; returns h_seq (T, n).

    ``weights_bf16=True`` stores U in VMEM as bfloat16 and runs the h-dot
    as a native single-pass bf16×bf16 MXU op (f32 accumulate) — halves the
    per-step weight-read volume, which dominates at wide n where U is
    megabytes (4 MB f32 at n=512). Numerics are the fast-mode class (the
    operands round to bf16 either way); only useful with relaxed dots."""
    T, g4 = xp.shape
    n = U.shape[0]
    assert g4 == 4 * n
    npg = _ceil_to(n, LANE)
    prec = _resolve_dot_precision(dot_precision)

    xp_p = pad_gate_cols(xp, n, npg)
    # Weights stay row-compact: (n, 4*npg), NOT padded to npg rows — the
    # kernel is VMEM-bandwidth-bound on weight streaming, and row padding
    # was a measured 1.7× loss; h is sliced to its live n lanes instead.
    U_p = pad_gate_cols(U, n, npg)
    if weights_bf16:
        U_p = U_p.astype(jnp.bfloat16)
    h0_p = _pad_state(h0, n, npg)
    c0_p = _pad_state(c0, n, npg)
    CT = min(ct, _ceil_to(T, 8))

    def kernel(xp_ref, u_ref, h0_ref, c0_ref, out_ref, h_scr, c_scr):
        @pl.when(pl.program_id(0) == 0)
        def _():
            h_scr[:] = h0_ref[:]
            c_scr[:] = c0_ref[:]

        def step(t):
            h_in = h_scr[:, :n]
            if weights_bf16:
                h_in = h_in.astype(jnp.bfloat16)
            z = xp_ref[pl.ds(t, 1), :] + _dot(h_in, u_ref[:], prec)
            h, c = _gates_p(z, c_scr[:], npg)
            h_scr[:] = h
            c_scr[:] = c
            out_ref[pl.ds(t, 1), :] = h

        _time_loop(step, CT, unroll)

    h_seq = _recurrence_call(
        kernel, T, CT, npg, [U_p, h0_p, c0_p], xp_p,
        [pltpu.VMEM((1, npg), jnp.float32)] * 2, interpret,
    )
    return h_seq[:, :n]


def reduced_recurrence_pallas(
    xp: jax.Array,
    uB,  # merged: (n, r); split: tuple of 4 (n, r_g)
    uC,  # merged: (r, 4n-r); split: tuple of 4 (r_g, n-r_g)
    h0: jax.Array | None = None,
    c0: jax.Array | None = None,
    ct: int = DEFAULT_CT,
    interpret: bool = False,
    unroll: int = DEFAULT_UNROLL,
    dot_precision=None,
) -> jax.Array:
    """Low-rank h-side recurrence via the folded (h@B)@[I|C] form."""
    T, g4 = xp.shape
    n = g4 // 4
    npg = _ceil_to(n, LANE)
    split = isinstance(uB, tuple)
    prec = _resolve_dot_precision(dot_precision)

    xp_p = pad_gate_cols(xp, n, npg)
    h0_p = _pad_state(h0, n, npg)
    c0_p = _pad_state(c0, n, npg)
    CT = min(ct, _ceil_to(T, 8))

    if split:
        # Packed formulation: all four gates' B factors concatenated into
        # ONE (n, sum r_g) matrix — a single dot computes every gate's
        # low-rank projection (sum r_g = 4r packs to exactly one 128-lane
        # block at r=32). Second stage stays per-gate with row-compact
        # [I|C] (r_g, npg). Measured 1.58× over the dense-reconstructed
        # scan at 3×512/r=32 batch-1 (11.6 vs 18.3 ms; the earlier
        # per-gate-B form with 8 dependent dots was slower than both, and
        # a block-diagonal packed [I|C] single second dot streams 2× more
        # and measured 17.7 ms — see scripts/probe_packed_split.py).
        ranks = tuple(B.shape[1] for B in uB)
        offs = tuple(int(sum(ranks[:g])) for g in range(4))
        Rp = _ceil_to(sum(ranks), LANE)
        Ball = pad_cols(jnp.concatenate(list(uB), axis=1), Rp)
        weights = [Ball]
        weights += [pad_cols(fold_IC(uB[g], uC[g]), npg) for g in range(4)]
        weights += [h0_p, c0_p]

        def kernel(xp_ref, *refs):
            h0_ref, c0_ref = refs[5], refs[6]
            out_ref = refs[7]
            h_scr, c_scr, z_scr = refs[8], refs[9], refs[10]

            @pl.when(pl.program_id(0) == 0)
            def _():
                h_scr[:] = h0_ref[:]
                c_scr[:] = c0_ref[:]

            def step(t):
                hb = _dot(h_scr[:, :n], refs[0][:], prec)  # (1, Rp), all gates
                for g in range(4):
                    z_scr[:, g * npg : (g + 1) * npg] = _dot(
                        hb[:, offs[g] : offs[g] + ranks[g]], refs[1 + g][:], prec
                    )
                z = z_scr[:] + xp_ref[pl.ds(t, 1), :]
                hn, cn = _gates_p(z, c_scr[:], npg)
                h_scr[:] = hn
                c_scr[:] = cn
                out_ref[pl.ds(t, 1), :] = hn

            _time_loop(step, CT, unroll)

        h_seq = _recurrence_call(
            kernel, T, CT, npg, weights, xp_p,
            [
                pltpu.VMEM((1, npg), jnp.float32),
                pltpu.VMEM((1, npg), jnp.float32),
                pltpu.VMEM((1, 4 * npg), jnp.float32),
            ],
            interpret,
        )
        return h_seq[:, :n]

    # merged: z = (h @ B) @ [I|C] with columns scattered to P-layout;
    # operands row-compact
    r = uB.shape[1]
    rp = _ceil_to(r, LANE)
    B_p = pad_cols(uB, rp)
    IC = fold_IC(uB, uC)  # (r, 4n), columns in original order
    IC_p = pad_gate_cols(IC, n, npg)

    def kernel(xp_ref, b_ref, ic_ref, h0_ref, c0_ref, out_ref, h_scr, c_scr):
        @pl.when(pl.program_id(0) == 0)
        def _():
            h_scr[:] = h0_ref[:]
            c_scr[:] = c0_ref[:]

        def step(t):
            hb = _dot(h_scr[:, :n], b_ref[:], prec)
            z = _dot(hb[:, :r], ic_ref[:], prec) + xp_ref[pl.ds(t, 1), :]
            hn, cn = _gates_p(z, c_scr[:], npg)
            h_scr[:] = hn
            c_scr[:] = cn
            out_ref[pl.ds(t, 1), :] = hn

        _time_loop(step, CT, unroll)

    h_seq = _recurrence_call(
        kernel, T, CT, npg, [B_p, IC_p, h0_p, c0_p], xp_p,
        [pltpu.VMEM((1, npg), jnp.float32)] * 2, interpret,
    )
    return h_seq[:, :n]


# ---------------------------------------------------------------------------
# fully-fused whole-model kernels (batch-1 streaming)
# ---------------------------------------------------------------------------

@functools.partial(
    jax.jit, static_argnames=("ct", "interpret", "unroll", "layout", "dot_precision")
)
def fused_dense_stack_pallas(
    params: StackedLSTMParams,
    x: jax.Array,
    ct: int = DEFAULT_CT,
    interpret: bool = False,
    unroll: int = DEFAULT_UNROLL,
    layout: str = "auto",
    dot_precision=None,
) -> jax.Array:
    """Whole stacked model + head in one kernel. x: (T, d) -> y: (T, out).

    Every layer's W/U/b stays VMEM-resident across all T steps; the head is
    applied to the last layer's hidden sequence outside the kernel (one MXU
    matmul).

    ``layout`` picks the per-layer gate packing:

    * ``"p"`` / ``"auto"`` — P-layout: each gate in its own 128-lane block
      (rows stay compact). Gate extraction is a tile-aligned slice.
    * ``"compact"`` — C-layout (n ≤ 64): gates packed 2 or 4 per lane
      block (pack_gate_cols_compact), halving / quartering the per-step
      streamed weight bytes; gate extraction via whole-block
      nonlinearities + static intra-block rolls (_gates_compact). Layers
      with n > 64 fall back to P-layout per layer.

    MEASURED (v5e, 4×40/4×30, T=6656, scripts/probe_compact_gates.py):
    compact is ~0.8× the P-layout speed DESPITE 2-4× fewer streamed bytes
    — at these scales the kernel is latency-chain-bound, not
    streaming-bound (P-layout 4×30 ≈ 4×40 time), and the extraction rolls
    sit on the critical chain. ``"auto"`` therefore resolves to P-layout;
    compact exists as the measured refutation of the byte-streaming
    hypothesis and for potential future hardware where streaming wins.
    """
    T, d = x.shape
    prec = _resolve_dot_precision(dot_precision)
    units = [l.units for l in params.layers]
    L = len(units)
    if layout not in ("auto", "p", "compact"):
        raise ValueError(f"unknown layout {layout!r}; expected 'auto' | 'p' | 'compact'")
    ks = [gate_group_size(n) if layout == "compact" else 1 for n in units]
    npgs = [_ceil_to(n, LANE) for n in units]
    # per-layer state width (z widths are derived from the packed weights)
    sws = [LANE if k > 1 else npg for k, npg in zip(ks, npgs)]
    dp = _ceil_to(d, LANE)

    x_p = pad_cols(x, dp)
    # Row-compact weights (W: (d_in, zw), U: (n, zw)) — the kernel is
    # VMEM-bandwidth-bound streaming weights each step; padding rows to 128
    # was a measured 1.7× loss. Live lanes are sliced off h before each dot.
    weights = []
    for i, l in enumerate(params.layers):
        if ks[i] > 1:
            pack = lambda M: pack_gate_cols_compact(M, units[i], ks[i])
        else:
            pack = lambda M: pad_gate_cols(M, units[i], npgs[i])
        weights.append(pack(l.W))
        weights.append(pack(l.U))
        weights.append(pack(l.b.reshape(1, -1)))

    CT = min(ct, _ceil_to(T, 8))
    Tp = _ceil_to(T, CT)
    if Tp != T:
        x_p = jnp.concatenate([x_p, jnp.zeros((Tp - T, dp), x_p.dtype)], axis=0)

    def kernel(x_ref, *refs):
        w_refs = refs[: 3 * L]
        out_ref = refs[3 * L]
        scr = refs[3 * L + 1 :]

        @pl.when(pl.program_id(0) == 0)
        def _():
            for s in scr:
                s[:] = jnp.zeros_like(s)

        def step(t):
            inp = x_ref[pl.ds(t, 1), :d]
            for i in range(L):
                z = (
                    _dot(inp, w_refs[3 * i][:], prec)
                    + _dot(scr[2 * i][:, : units[i]], w_refs[3 * i + 1][:], prec)
                    + w_refs[3 * i + 2][:]
                )
                if ks[i] > 1:
                    h, c = _gates_compact(z, scr[2 * i + 1][:], units[i], ks[i], interpret)
                else:
                    h, c = _gates_p(z, scr[2 * i + 1][:], npgs[i])
                scr[2 * i][:] = h
                scr[2 * i + 1][:] = c
                inp = h[:, : units[i]]
            out_ref[pl.ds(t, 1), :] = scr[2 * (L - 1)][:]

        _time_loop(step, CT, unroll)

    scratch = []
    for sw in sws:
        scratch += [pltpu.VMEM((1, sw), jnp.float32)] * 2

    h_seq = pl.pallas_call(
        kernel,
        grid=(Tp // CT,),
        out_shape=jax.ShapeDtypeStruct((Tp, sws[-1]), jnp.float32),
        in_specs=[pl.BlockSpec((CT, dp), lambda i: (i, 0), memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(weights),
        out_specs=pl.BlockSpec((CT, sws[-1]), lambda i: (i, 0), memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
        interpret=interpret,
    )(x_p, *weights)
    h_seq = h_seq[:T, : units[-1]]
    return h_seq @ params.head.w + params.head.b


@functools.partial(
    jax.jit, static_argnames=("ct", "interpret", "unroll", "dot_precision")
)
def fused_reduced_stack_pallas(
    params: ReducedModelParams,
    x: jax.Array,
    ct: int = DEFAULT_CT,
    interpret: bool = False,
    unroll: int = DEFAULT_UNROLL,
    dot_precision=None,
) -> jax.Array:
    """Whole reduced (folded two-step) model + head in one kernel.

    Both the input-side and recurrent-side low-rank products run as
    (v @ B) @ [I|C] pairs per layer (merged) or per gate (split)."""
    T, d = x.shape
    prec = _resolve_dot_precision(dot_precision)
    layers = params.layers
    units = [l.units for l in layers]
    L = len(layers)
    npgs = [_ceil_to(n, LANE) for n in units]
    dp = _ceil_to(d, LANE)

    x_p = pad_cols(x, dp)

    # Row-compact operands throughout (weight streaming is the bottleneck):
    # B: (in_dim, rp) cols lane-padded; [I|C]: (r, npg or 4npg) rows compact.
    weights = []
    layouts = []  # per layer: (split, first_index, w_ranks, u_ranks)
    for i, l in enumerate(layers):
        n = units[i]
        npg = npgs[i]
        first = len(weights)
        if l.split:
            w_ranks = tuple(B.shape[1] for B in l.wB)
            u_ranks = tuple(B.shape[1] for B in l.uB)
            for g in range(4):
                weights.append(pad_cols(l.wB[g], _ceil_to(w_ranks[g], LANE)))
                weights.append(pad_cols(fold_IC(l.wB[g], l.wC[g]), npg))
            for g in range(4):
                weights.append(pad_cols(l.uB[g], _ceil_to(u_ranks[g], LANE)))
                weights.append(pad_cols(fold_IC(l.uB[g], l.uC[g]), npg))
        else:
            w_ranks = (l.wB.shape[1],)
            u_ranks = (l.uB.shape[1],)
            weights.append(pad_cols(l.wB, _ceil_to(w_ranks[0], LANE)))
            weights.append(pad_gate_cols(fold_IC(l.wB, l.wC), n, npg))
            weights.append(pad_cols(l.uB, _ceil_to(u_ranks[0], LANE)))
            weights.append(pad_gate_cols(fold_IC(l.uB, l.uC), n, npg))
        weights.append(pad_gate_cols(l.b.reshape(1, -1), n, npg))
        layouts.append((l.split, first, w_ranks, u_ranks))

    CT = min(ct, _ceil_to(T, 8))
    Tp = _ceil_to(T, CT)
    if Tp != T:
        x_p = jnp.concatenate([x_p, jnp.zeros((Tp - T, dp), x_p.dtype)], axis=0)

    def kernel(x_ref, *refs):
        w_refs = refs[: len(weights)]
        out_ref = refs[len(weights)]
        scr = refs[len(weights) + 1 :]
        # scr: per layer [h, c, z] (z only used in split mode; cheap)

        @pl.when(pl.program_id(0) == 0)
        def _():
            for i in range(L):
                scr[3 * i][:] = jnp.zeros_like(scr[3 * i])
                scr[3 * i + 1][:] = jnp.zeros_like(scr[3 * i + 1])

        def step(t):
            inp = x_ref[pl.ds(t, 1), :d]
            for i, (split, first, w_ranks, u_ranks) in enumerate(layouts):
                npg = npgs[i]
                n_i = units[i]
                h_scr, c_scr, z_scr = scr[3 * i], scr[3 * i + 1], scr[3 * i + 2]
                h_live = h_scr[:, :n_i]
                if split:
                    for g in range(4):
                        xb = _dot(inp, w_refs[first + 2 * g][:], prec)
                        zx = _dot(xb[:, : w_ranks[g]], w_refs[first + 2 * g + 1][:], prec)
                        hb = _dot(h_live, w_refs[first + 8 + 2 * g][:], prec)
                        zu = _dot(hb[:, : u_ranks[g]], w_refs[first + 8 + 2 * g + 1][:], prec)
                        z_scr[:, g * npg : (g + 1) * npg] = zx + zu
                    z = z_scr[:] + w_refs[first + 16][:]
                else:
                    xb = _dot(inp, w_refs[first][:], prec)
                    zx = _dot(xb[:, : w_ranks[0]], w_refs[first + 1][:], prec)
                    hb = _dot(h_live, w_refs[first + 2][:], prec)
                    zu = _dot(hb[:, : u_ranks[0]], w_refs[first + 3][:], prec)
                    z = zx + zu + w_refs[first + 4][:]
                h, c = _gates_p(z, c_scr[:], npg)
                h_scr[:] = h
                c_scr[:] = c
                inp = h[:, :n_i]
            out_ref[pl.ds(t, 1), :] = scr[3 * (L - 1)][:]

        _time_loop(step, CT, unroll)

    scratch = []
    for npg in npgs:
        scratch += [
            pltpu.VMEM((1, npg), jnp.float32),
            pltpu.VMEM((1, npg), jnp.float32),
            pltpu.VMEM((1, 4 * npg), jnp.float32),
        ]

    h_seq = pl.pallas_call(
        kernel,
        grid=(Tp // CT,),
        out_shape=jax.ShapeDtypeStruct((Tp, npgs[-1]), jnp.float32),
        in_specs=[pl.BlockSpec((CT, dp), lambda i: (i, 0), memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(weights),
        out_specs=pl.BlockSpec((CT, npgs[-1]), lambda i: (i, 0), memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
        interpret=interpret,
    )(x_p, *weights)
    h_seq = h_seq[:T, : units[-1]]
    return h_seq @ params.head.w + params.head.b


# ---------------------------------------------------------------------------
# jitted convenience wrappers (hybrid XLA-matmul + pallas-recurrence paths)
# ---------------------------------------------------------------------------

@functools.partial(
    jax.jit, static_argnames=("interpret", "dot_precision", "weights_bf16")
)
def dense_forward_hybrid(
    params: StackedLSTMParams,
    x: jax.Array,
    interpret: bool = False,
    dot_precision=None,
    weights_bf16: bool = False,
) -> jax.Array:
    """Per-layer hybrid: XLA big MXU matmul for every layer's input
    projection, Pallas kernel for its recurrence. x: (T, d) -> y: (T, out).

    ``dot_precision="default"`` relaxes BOTH the x-side matmuls and the
    in-kernel dots to single-pass bf16 multiplies (f32 accumulate) — the
    batch-1 fast mode. At 3×512/T=6656 this makes the hybrid the best
    dense path (10.2 ms vs the f32 scan's 13.9; the f32-forced hybrid is
    46 ms — see scripts/probe_wide_default_precision.py).

    ``weights_bf16=True`` additionally stores each layer's U in VMEM as
    bfloat16 (see :func:`lstm_recurrence_pallas`) — the wide dense
    recurrence is weight-read-bound and the dots already round operands
    to bf16 under relaxed precision."""
    prec = _resolve_dot_precision(dot_precision)
    h = x
    for l in params.layers:
        xp = jnp.dot(h, l.W, precision=prec) + l.b  # (T, 4n) — one MXU matmul
        h = lstm_recurrence_pallas(
            xp, l.U, interpret=interpret, dot_precision=dot_precision,
            weights_bf16=weights_bf16,
        )
    return h @ params.head.w + params.head.b


@functools.partial(jax.jit, static_argnames=("interpret", "dot_precision"))
def reduced_forward_hybrid(
    params: ReducedModelParams,
    x: jax.Array,
    interpret: bool = False,
    dot_precision=None,
) -> jax.Array:
    """Hybrid path for the reduced model: two-step input projections as big
    XLA matmuls, folded two-step recurrence in Pallas.

    ``dot_precision="default"`` = batch-1 fast mode (see
    :func:`dense_forward_hybrid`): 9.83 → 5.40 ms at 3×512/r=32/T=6656,
    rel.err ~6e-3."""
    from svd_lstm_tpu.models.reduced import reduced_projection

    prec = _resolve_dot_precision(dot_precision)
    relaxed = prec == jax.lax.Precision.DEFAULT
    h = x
    for l in params.layers:
        with (
            jax.default_matmul_precision("bfloat16")
            if relaxed
            else contextlib.nullcontext()
        ):
            xp = reduced_projection(l, h, "w") + l.b
        uB = tuple(l.uB) if l.split else l.uB
        uC = tuple(l.uC) if l.split else l.uC
        h = reduced_recurrence_pallas(
            xp, uB, uC, interpret=interpret, dot_precision=dot_precision
        )
    return h @ params.head.w + params.head.b
