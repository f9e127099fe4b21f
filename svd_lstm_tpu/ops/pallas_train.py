"""Trainable (custom-VJP) Pallas LSTM recurrence for the training step.

The training loop's recurrence scans re-stream the recurrent matrix from
HBM every timestep in BOTH the forward and backward pass (the same
bottleneck ops/pallas_batched.py removes from inference). This module
makes the batched VMEM-resident forward kernel differentiable:

* **forward** — the Pallas kernel (U resident in VMEM, one (B, 4n) xp
  block per sequential grid step), emitting BOTH ``h_seq`` and ``c_seq``
  (the backward needs the cell states).
* **backward** — a reverse-time Pallas kernel with U AND U^T resident in
  VMEM and the (n, 4n) dU accumulator living in VMEM scratch across the
  whole grid. It *recomputes* the gates from ``(xp, h_prev)`` (one extra
  dot per step — the standard remat trade; saving gate activations would
  cost (T, B, 4n) extra HBM). Per step: ``dz`` from the gate derivatives,
  ``dh_prev = dz @ U^T``, ``dU += h_prev^T @ dz``, ``dxp = dz``.

Measured, one n=512 layer at B=128/T=200 (scripts/probe_train_bwd.py):
fwd+bwd 1.55 ms vs XLA scan autodiff's 4.29 ms (2.8x), gradients exact.
An XLA-scan backward variant (``_trainable_bwd``, kept as the test
reference) measured 7.1 ms — re-streaming U/U^T from HBM at every
backward step is precisely what the kernel removes. Whole train step
(3x512, B=128, T=200, adam): **13.1 ms vs the bf16 XLA scan's 19.7 and
the f32 default's 41.3** (probe_train_kernel.py).

All dots run at ``precision=DEFAULT`` (single-pass bf16 multiply, f32
accumulate) — numerically equivalent to training under
``TrainConfig.matmul_precision="bfloat16"``, which is the regime where
this path applies (exact-f32 training keeps the pure-XLA scan).

Gradient parity with autodiff of the scan recurrence is asserted to
~1e-7 in tests/test_pallas_train.py.

Reference role: the reference trains through Keras ``backend.rnn``
(reference code/svd_classes_v3.py:408-419); this is its TPU training-path
replacement at wide model widths.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from svd_lstm_tpu.models.lstm import StackedLSTMParams, gate_update, gate_update_bwd
from svd_lstm_tpu.ops.pallas_batched import DEFAULT_BT, LANE, _ceil_to

DEF = jax.lax.Precision.DEFAULT

# Largest whole-batch the narrow fused kernel program is measured to
# compile at in every weight-provenance regime. Rounds 3-4 (with the
# shifted-copy h_prev backward): reconstruction-fed programs crashed for
# every B >= 512 (scripts/probe_finetune_b512_*.py). Round-5
# remeasurement AFTER the no-copy backward: the whole-batch program now
# compiles AND wins at exactly B=512 — compact 2.142 vs 2.328 ms
# chunked, P-layout 2.769 vs 2.872, reconstruction-fed 2.219 vs 2.388 —
# while B >= 768 whole-batch still fails the remote Mosaic compile
# (HTTP 500) in every regime, so the boundary moved 496 -> 512, not
# away. The on-TPU suite pins whole-batch B=512 in both layouts plus
# the reconstruction-fed path, so a toolchain regression is caught.
_MAX_WHOLE_BATCH = 512
# compact-gate-layout crossover: measured on v5e through the production
# dispatch (scripts/probe_train_compact_ab.py) — P-layout wins at B=32,
# compact from B=128 up. "auto" resolves with this.
_COMPACT_MIN_BATCH = 128
# Target chunk size past the cliff: the measured per-sample optimum
# (8.3 µs/sample at 256 vs 10.6 at 512 whole-batch). Chunks are balanced:
# with k = ceil(B/256) instances, each runs c = ceil(B/k) rows rounded up
# to 8 — always <= 256 (never past the cliff) but as small as ~176 just
# past a multiple of 256 (B=513 -> 3x176). Total padding is < one chunk
# (B > (k-1)*c forces k*c - B < c; e.g. 248 rows at B=8200) and sits
# entirely in the LAST chunk (zero rows, gradient-inert).
_TRAIN_CHUNK = 256


def is_narrow(params: StackedLSTMParams, d_in: int) -> bool:
    """Eligibility for the fused whole-stack narrow kernels (every layer
    n <= 128 lanes and the input dim too) — the ONE definition, shared by
    this dispatch and the reconstruction-fed wrappers
    (ops/singular_train.chunked_fast_train)."""
    return all(l.units <= LANE for l in params.layers) and d_in <= LANE


def _fwd_scan_hc(xp, U):
    """XLA scan forward returning (h_seq, c_seq) — the CPU/fallback path
    and the arithmetic the kernel must reproduce."""
    T, B, g4 = xp.shape
    n = U.shape[0]
    h0 = jnp.zeros((B, n), jnp.float32)
    c0 = jnp.zeros((B, n), jnp.float32)

    def step(carry, xp_t):
        h, c = carry
        z = xp_t + jnp.dot(h, U, precision=DEF)
        h, c = gate_update(z, c)
        return (h, c), (h, c)

    _, (h_seq, c_seq) = jax.lax.scan(step, (h0, c0), xp)
    return h_seq, c_seq


def _pallas_fwd_hc(xp, U, bt: int, interpret: bool):
    """VMEM-resident forward emitting (h_seq, c_seq). Pads B to a multiple
    of the batch tile (ops/pallas_batched.py layout)."""
    T, B, g4 = xp.shape
    n = U.shape[0]
    assert n % LANE == 0 and g4 == 4 * n
    BT = min(bt, _ceil_to(B, 8))
    Bp = _ceil_to(B, BT)
    xp_p = xp.reshape(T * B, g4)
    if Bp != B:
        pad = jnp.zeros((T, Bp - B, g4), xp.dtype)
        xp_p = jnp.concatenate([xp.reshape(T, B, g4), pad], axis=1).reshape(
            T * Bp, g4
        )
    nbt = Bp // BT

    def kernel(xp_ref, u_ref, h_out, c_out, h_scr, c_scr):
        @pl.when(pl.program_id(1) == 0)
        def _():
            h_scr[:] = jnp.zeros_like(h_scr)
            c_scr[:] = jnp.zeros_like(c_scr)

        z = (
            jnp.dot(h_scr[:], u_ref[:], preferred_element_type=jnp.float32,
                    precision=DEF)
            + xp_ref[:].astype(jnp.float32)
        )
        h, c = gate_update(z, c_scr[:])
        h_scr[:] = h
        c_scr[:] = c
        h_out[:] = h
        c_out[:] = c

    spec = pl.BlockSpec((BT, n), lambda i, t: (t * nbt + i, 0), memory_space=pltpu.VMEM)
    h2, c2 = pl.pallas_call(
        kernel,
        grid=(nbt, T),
        in_specs=[
            pl.BlockSpec(
                (BT, g4), lambda i, t: (t * nbt + i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[spec, spec],
        out_shape=[jax.ShapeDtypeStruct((T * Bp, n), jnp.float32)] * 2,
        scratch_shapes=[pltpu.VMEM((BT, n), jnp.float32)] * 2,
        interpret=interpret,
    )(xp_p, U.astype(jnp.float32))
    return (
        h2.reshape(T, Bp, n)[:, :B],
        c2.reshape(T, Bp, n)[:, :B],
    )


# Backward batch tile: smaller than the forward's — the bwd kernel holds
# U, U^T AND the (n, 4n) dU accumulator in VMEM, leaving less room for
# activation blocks.
DEFAULT_BWD_BT = 128


def _pallas_bwd(xp, U, h_seq, c_seq, dh_seq, bt: int, interpret: bool):
    """Reverse-time Pallas backward: U and U^T VMEM-resident, dU
    accumulated in f32 VMEM scratch across the whole (batch-tile, time)
    grid, (dxp, dU) out. Measured 2.8x the XLA autodiff fwd+bwd for one
    n=512 layer (1.55 vs 4.29 ms at B=128/T=200, exact gradients —
    scripts/probe_train_bwd.py)."""
    T, B, g4 = xp.shape
    n = U.shape[0]
    BT = min(bt, _ceil_to(B, 8))
    Bp = _ceil_to(B, BT)

    def padB(a):  # (T, B, w) -> flattened (T*Bp, w); zero rows are inert
        if Bp != B:
            pad = jnp.zeros((T, Bp - B) + a.shape[2:], a.dtype)
            a = jnp.concatenate([a, pad], axis=1)
        return a.reshape(T * Bp, -1)

    nbt = Bp // BT

    # reverse time, batch tiles outer: block row index (T-1-t)*nbt + i
    rev = lambda i, t: ((T - 1 - t) * nbt + i, 0)  # noqa: E731
    # prev-state blocks read from the forward's own outputs one time-block
    # earlier (no materialized shifted copies — full-tensor HBM copy
    # traffic, round-5 decomposition); first reverse step clamps to block
    # 0 and the kernel masks the value to zero
    prev = lambda i, t: (jnp.maximum(T - 2 - t, 0) * nbt + i, 0)  # noqa: E731

    def kernel(xp_ref, hp_ref, cp_ref, ct_ref, dh_ref, u_ref, ut_ref,
               dxp_ref, du_ref, dh_scr, dc_scr, du_scr):
        i_tile = pl.program_id(0)
        t = pl.program_id(1)

        @pl.when(t == 0)  # each batch tile's reverse sweep starts clean
        def _():
            dh_scr[:] = jnp.zeros_like(dh_scr)
            dc_scr[:] = jnp.zeros_like(dc_scr)

        @pl.when((i_tile == 0) & (t == 0))  # dU accumulates across tiles
        def _():
            du_scr[:] = jnp.zeros_like(du_scr)

        first = t == T - 1  # processing time 0: h_prev = c_prev = 0
        hp = jnp.where(first, 0.0, hp_ref[:])
        cp = jnp.where(first, 0.0, cp_ref[:])
        dh = dh_ref[:] + dh_scr[:]
        z = xp_ref[:] + jnp.dot(hp, u_ref[:],
                                preferred_element_type=jnp.float32, precision=DEF)
        dz, dc_new = gate_update_bwd(z, cp, ct_ref[:], dh, dc_scr[:])
        dxp_ref[:] = dz
        dh_scr[:] = jnp.dot(dz, ut_ref[:], preferred_element_type=jnp.float32,
                            precision=DEF)
        dc_scr[:] = dc_new
        du_scr[:] += jnp.dot(hp.T, dz,
                             preferred_element_type=jnp.float32, precision=DEF)

        @pl.when((i_tile == nbt - 1) & (t == T - 1))
        def _():
            du_ref[:] = du_scr[:]

    bspec = lambda w: pl.BlockSpec((BT, w), rev, memory_space=pltpu.VMEM)  # noqa: E731
    dxp, dU = pl.pallas_call(
        kernel,
        grid=(nbt, T),
        in_specs=[
            bspec(g4),
            pl.BlockSpec((BT, n), prev, memory_space=pltpu.VMEM),
            pl.BlockSpec((BT, n), prev, memory_space=pltpu.VMEM),
            bspec(n), bspec(n),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            bspec(g4),
            pl.BlockSpec((n, g4), lambda i, t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T * Bp, g4), jnp.float32),
            jax.ShapeDtypeStruct((n, g4), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((BT, n), jnp.float32),
            pltpu.VMEM((BT, n), jnp.float32),
            pltpu.VMEM((n, g4), jnp.float32),
        ],
        interpret=interpret,
    )(
        padB(xp), padB(h_seq), padB(c_seq), padB(c_seq), padB(dh_seq),
        U.astype(jnp.float32), U.T.astype(jnp.float32),
    )
    return dxp.reshape(T, Bp, g4)[:, :B], dU


@functools.lru_cache(maxsize=None)
def _make_trainable(bt: int, interpret: bool):
    """custom_vjp closure over the static kernel knobs (a cached factory —
    custom_vjp nondiff_argnums argument-order semantics vary across jax
    versions, closures don't)."""

    @jax.custom_vjp
    def rec(xp, U):
        # Non-differentiated calls (e.g. an eval forward through the same
        # apply_fn) run the SAME Pallas kernel as the fwd rule below —
        # custom_vjp only routes through fwd under jax.grad, and the old
        # scan primal silently made plain forwards ~3x slower than the
        # docstring promised.
        return _pallas_fwd_hc(xp, U, bt, interpret)[0]

    def fwd(xp, U):
        h_seq, c_seq = _pallas_fwd_hc(xp, U, bt, interpret)
        return h_seq, (xp, U, h_seq, c_seq)

    def bwd(res, dh_seq):
        xp, U, h_seq, c_seq = res
        return _pallas_bwd(
            xp, U, h_seq, c_seq, dh_seq, min(bt, DEFAULT_BWD_BT), interpret
        )

    rec.defvjp(fwd, bwd)
    return rec


def lstm_recurrence_trainable(
    xp, U, bt: int = DEFAULT_BT, interpret: bool = False
):
    """Differentiable batched recurrence; returns h_seq (T, B, n) f32.

    Forward runs the VMEM-resident Pallas kernel (n must be a multiple of
    128); gradients flow to both ``xp`` and ``U``.
    """
    return _make_trainable(bt, interpret)(xp, U)


def _trainable_bwd(res, dh_seq):
    """XLA reverse-scan backward — the readable reference implementation
    the Pallas backward is tested against (slower: 7.1 ms vs 1.55 for one
    wide layer; kept for parity checks and CPU-debugging)."""
    xp, U, h_seq, c_seq = res
    T, B, g4 = xp.shape
    n = U.shape[0]
    zeros = jnp.zeros((1, B, n), jnp.float32)
    h_prev = jnp.concatenate([zeros, h_seq[:-1]], axis=0)
    c_prev = jnp.concatenate([zeros, c_seq[:-1]], axis=0)
    Ut = U.T

    def step(carry, inp):
        dh_carry, dc = carry
        dh_out, xp_t, hp, cp, ct = inp
        dh = dh_out + dh_carry
        z = xp_t + jnp.dot(hp, U, precision=DEF)  # gate recompute (remat)
        zi, zf, zg, zo = jnp.split(z, 4, axis=-1)
        i = jax.nn.sigmoid(zi)
        f = jax.nn.sigmoid(zf)
        g = jnp.tanh(zg)
        o = jax.nn.sigmoid(zo)
        tc = jnp.tanh(ct)
        dc_tot = dc + dh * o * (1.0 - tc * tc)
        dz = jnp.concatenate(
            [
                dc_tot * g * i * (1.0 - i),
                dc_tot * cp * f * (1.0 - f),
                dc_tot * i * (1.0 - g * g),
                dh * tc * o * (1.0 - o),
            ],
            axis=-1,
        )
        dh_prev = jnp.dot(dz, Ut, precision=DEF)
        dU_t = jnp.dot(hp.T, dz, precision=DEF)
        return (dh_prev, dc_tot * f), (dz, dU_t)

    init = (jnp.zeros((B, n), jnp.float32),) * 2
    _, (dxp, dU_t) = jax.lax.scan(
        step, init, (dh_seq, xp, h_prev, c_prev, c_seq), reverse=True
    )
    return dxp, jnp.sum(dU_t, axis=0)


def _chunked_narrow(apply_one, params, x_seq, return_sequences, interpret, B):
    """Balanced ~256-row independent chunks past the measured whole-batch
    cliff (B=512: 2x256 = 4.27-4.30 ms, vs 5.42 for the whole batch where
    it compiles at all; B=1024 whole doesn't compile —
    scripts/probe_train_dense_chunk.py, probe_finetune_b512_chunk.py).
    Rows are independent, so gradients through the concat are exact and
    zero-padded rows get zero cotangent. Shared by the P-layout and
    compact narrow paths."""
    k = -(-B // _TRAIN_CHUNK)
    c = -(-(-(-B // k)) // 8) * 8  # ceil(B/k) rounded up to 8 rows
    pad = k * c - B
    if pad:
        x_seq = jnp.concatenate(
            [x_seq, jnp.zeros((pad,) + x_seq.shape[1:], x_seq.dtype)],
            axis=0,
        )
    outs = [
        apply_one(
            params,
            x_seq[i * c : (i + 1) * c],
            return_sequences=return_sequences,
            interpret=interpret,
        )
        for i in range(k)
    ]
    return jnp.concatenate(outs, axis=0)[:B]


def stacked_lstm_apply_fast_train(
    params: StackedLSTMParams,
    x_seq: jax.Array,
    return_sequences: bool = True,
    interpret: bool = False,
    wide_fused: bool = True,
    compact: bool | str = "auto",
) -> jax.Array:
    """Drop-in ``apply_fn`` for ``train.loop.fit`` running the recurrences
    through the trainable Pallas kernel pair. Dots are DEFAULT-precision —
    pair with ``TrainConfig.matmul_precision="bfloat16"`` semantics;
    exact-f32 training should keep ``stacked_lstm_apply``.

    Program-structure constraint (measured, this Mosaic toolchain): a
    program with >= 2 forward-kernel instances, >= 1 backward-kernel
    instance AND a differentiated XLA matmul between layers crashes the
    remote compiler — any one of the three alone is fine. The dispatch
    therefore is:

    * **narrow stack** (every layer n <= 128, input dim <= 128 — the
      reference's model zoo) — ONE fused whole-stack kernel per direction
      (ops/pallas_train_fused.py), inter-layer projections in-kernel.
      With ``compact=True`` (TrainConfig.compact_gates) eligible stacks
      use the compact-gate-layout kernel pair instead
      (ops/pallas_train_compact.py; same chunking past the batch cliff).
    * **uniform lane-aligned stack** (every layer the same n, n % 128 == 0)
      — ``lax.scan`` over stacked per-layer weights, whose body holds the
      ONE fully-fused layer kernel (ops/pallas_train_wide.py: x-projection
      AND weight grads in-kernel, no (T, B, 4n) HBM arrays, no
      differentiated XLA matmul in the body at all). Layer 1's W is
      zero-row-padded from d to n and x zero-column-padded — exact, the
      pads contribute nothing. ``wide_fused=False`` keeps the round-3
      split form (XLA xp matmul + recurrence-only kernel) for A/B probes.
    * exactly one aligned layer — per-layer loop, kernel pair on it.
    * otherwise — the XLA scan everywhere (narrow models don't benefit
      from the kernel anyway; mixed wide stacks hit the compiler bug).

    x_seq: (B, T, d) -> (B, T, out) / (B, out).
    """
    units = [l.units for l in params.layers]
    B, _, d_in = x_seq.shape
    narrow = is_narrow(params, d_in)
    if compact == "auto":
        # measured crossover (scripts/probe_train_compact_ab.py on v5e,
        # 4x40/T=200, full train step through THIS dispatch): B=32
        # P-layout 0.409 vs compact 0.657 ms; B=128 1.068 vs 0.993;
        # B=512 (2x256 chunks) 4.298 vs 3.690 — small batches are
        # grid-latency-bound and the compact layout's extra in-kernel
        # gate bookkeeping loses, large batches are compute-bound and
        # packing gates 3-per-128-lane-block wins. BENCH_NOTES §round-5
        # compact A/B.
        compact = B >= _COMPACT_MIN_BATCH
    if compact and narrow:
        # compact gate layout (k gates per 128-lane block) when the stack
        # fits it — otherwise fall through to the P-layout paths below
        from svd_lstm_tpu.ops.pallas_train_compact import (
            compact_eligible,
            fused_narrow_train_apply_compact,
        )

        if compact_eligible(params, d_in) and B % 8 == 0:
            if B > _MAX_WHOLE_BATCH:
                return _chunked_narrow(
                    fused_narrow_train_apply_compact,
                    params, x_seq, return_sequences, interpret, B,
                )
            return fused_narrow_train_apply_compact(
                params, x_seq,
                return_sequences=return_sequences, interpret=interpret,
            )
    if narrow and B > _MAX_WHOLE_BATCH:
        from svd_lstm_tpu.ops.pallas_train_fused import fused_narrow_train_apply

        return _chunked_narrow(
            fused_narrow_train_apply,
            params, x_seq, return_sequences, interpret, B,
        )
    if narrow and B % 8 == 0:
        # narrow stack (the reference's own scale): ONE fused kernel per
        # direction for the whole model — 5.42 ms/step vs the 7.65 bf16 /
        # 9.32 f32 XLA scans at 4x40/B=512/T=200
        # (scripts/probe_train_fused_narrow.py)
        from svd_lstm_tpu.ops.pallas_train_fused import fused_narrow_train_apply

        return fused_narrow_train_apply(
            params, x_seq, return_sequences=return_sequences, interpret=interpret
        )
    h = jnp.swapaxes(x_seq, 0, 1)  # (T, B, d)
    n0 = units[0]
    uniform = (
        len(params.layers) >= 2
        and all(u == n0 for u in units)
        and n0 % LANE == 0
        # layer 1's W is zero-row-padded UP to the stack width below, so
        # d > n0 can't stack with the other layers' (n0, 4n0) weights —
        # route those to the per-layer/scan fallback
        and x_seq.shape[-1] <= n0
    )
    if uniform:
        T, B, d = h.shape
        W1 = params.layers[0].W
        if d < n0:  # zero-pad layer 1 to the stack width (exact)
            W1 = jnp.concatenate(
                [W1, jnp.zeros((n0 - d, 4 * n0), W1.dtype)], axis=0
            )
            h = jnp.concatenate([h, jnp.zeros((T, B, n0 - d), h.dtype)], axis=-1)
        if wide_fused:
            # Python-unrolled layer loop (round 5): the lax.scan over
            # stacked weights double-saved every inter-layer activation
            # (layer i's h_seq again as layer i+1's x residual) and paid
            # scan-stack copies — measured 9.90 -> 7.34 ms at
            # 3x512/B=128/T=200 with BIT-IDENTICAL gradients
            # (probe_wide_unroll; floor_fraction 1.04 after). Safe from
            # the multi-kernel Mosaic crash because the fully-fused layer
            # kernel leaves NO differentiated XLA matmul between layers
            # (the crash needs all three conditions, module docstring).
            from svd_lstm_tpu.ops.pallas_train_wide import wide_layer_trainable

            for W, layer in zip(
                [W1] + [l.W for l in params.layers[1:]], params.layers
            ):
                h = wide_layer_trainable(h, W, layer.U, layer.b,
                                         interpret=interpret)
        else:
            # split form (differentiated XLA xp matmul between layers):
            # keep the scan — unrolled, >= 2 fwd kernel instances + a bwd
            # instance + that matmul crash the remote Mosaic compiler
            Ws = jnp.stack([W1] + [l.W for l in params.layers[1:]])
            Us = jnp.stack([l.U for l in params.layers])
            bs = jnp.stack([l.b for l in params.layers])

            def body(hh, wub):
                W, U, b = wub
                xp = jnp.dot(hh, W, precision=DEF) + b
                hh = lstm_recurrence_trainable(xp, U, DEFAULT_BT, interpret)
                return hh, 0.0

            h, _ = jax.lax.scan(body, h, (Ws, Us, bs))
    else:
        n_aligned = sum(1 for u in units if u % LANE == 0)
        for layer in params.layers:
            xp = jnp.dot(h, layer.W, precision=DEF) + layer.b
            if layer.units % LANE == 0 and n_aligned == 1:
                h = lstm_recurrence_trainable(xp, layer.U, DEFAULT_BT, interpret)
            else:
                h = _fwd_scan_hc(xp, layer.U)[0]
    if not return_sequences:
        h = h[-1]  # (B, n)
        return h @ params.head.w + params.head.b
    out = h @ params.head.w + params.head.b  # (T, B, out)
    return jnp.swapaxes(out, 0, 1)
