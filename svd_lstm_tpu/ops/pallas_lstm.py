"""Pallas TPU kernels for the LSTM recurrence — the component the reference
could not deliver: its compressed model ran ~1.3× SLOWER in Python/Keras
(reference plots/timing_plot.png, slide 15). Here the whole sequential
recurrence runs inside a single kernel with the recurrent weights and the
(h, c) state resident in VMEM for the entire sequence, so the per-step cost
is one small matvec chain with zero HBM traffic and zero per-step dispatch.

Two kernel families:

* ``lstm_recurrence_pallas`` / ``reduced_recurrence_pallas`` — one layer's
  h-side recurrence, consuming a precomputed input projection ``xp``
  (the x-side is one big MXU matmul done by XLA outside the kernel);
* ``fused_dense_stack_pallas`` / ``fused_reduced_stack_pallas`` — the whole
  stacked model + dense head for batch-1 streaming inference in ONE kernel
  (every weight of every layer stays in VMEM across all T steps). This is
  the real-time deployment path (reference
  code/old_versions/svd_classes.py:104-119 is its per-sample Python loop).

All kernels are f32, batch-1 (the latency path the reference benchmarks and
the LabVIEW export targets); batched throughput inference uses the XLA scan
path in ``svd_lstm_tpu.ops.recurrence`` which the MXU already serves well.

Shapes here are tiny (d=16, n=40, 4n=160 — far below the 128×128 MXU tile),
so the win comes from fusion + residency, not matmul throughput
(SURVEY.md §7 hard part (b)).
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from svd_lstm_tpu.models.lstm import StackedLSTMParams
from svd_lstm_tpu.models.reduced import ReducedModelParams

_MAX_RESIDENT_T = 32768  # (T,4n) f32 xp must fit VMEM alongside weights


def _gates(z: jax.Array, c: jax.Array, n: int) -> Tuple[jax.Array, jax.Array]:
    """z: (1, 4n) pre-activations [i|f|c|o]; returns (h, c)."""
    i = jax.nn.sigmoid(z[:, :n])
    f = jax.nn.sigmoid(z[:, n : 2 * n])
    g = jnp.tanh(z[:, 2 * n : 3 * n])
    o = jax.nn.sigmoid(z[:, 3 * n :])
    c_new = f * c + i * g
    return o * jnp.tanh(c_new), c_new


def _dot(a: jax.Array, b: jax.Array) -> jax.Array:
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


# ---------------------------------------------------------------------------
# single-layer recurrence kernels
# ---------------------------------------------------------------------------

def lstm_recurrence_pallas(
    xp: jax.Array,  # (T, 4n) input projection incl. bias
    U: jax.Array,   # (n, 4n)
    h0: jax.Array,  # (1, n)
    c0: jax.Array,  # (1, n)
    interpret: bool = False,
) -> jax.Array:
    """Dense h-side recurrence in one kernel; returns h_seq (T, n)."""
    T, g4 = xp.shape
    n = U.shape[0]
    assert g4 == 4 * n and T <= _MAX_RESIDENT_T

    def kernel(xp_ref, u_ref, h0_ref, c0_ref, out_ref, h_scr, c_scr):
        h_scr[:] = h0_ref[:]
        c_scr[:] = c0_ref[:]
        u = u_ref[:]

        def body(t, _):
            z = xp_ref[pl.ds(t, 1), :] + _dot(h_scr[:], u)
            h, c = _gates(z, c_scr[:], n)
            h_scr[:] = h
            c_scr[:] = c
            out_ref[pl.ds(t, 1), :] = h
            return 0

        jax.lax.fori_loop(0, T, body, 0)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((T, n), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((1, n), jnp.float32),
            pltpu.VMEM((1, n), jnp.float32),
        ],
        interpret=interpret,
    )(xp, U, h0, c0)


def reduced_recurrence_pallas(
    xp: jax.Array,
    uB,  # merged: (n, r); split: tuple of 4 (n, r_g)
    uC,  # merged: (r, 4n-r); split: tuple of 4 (r_g, n-r_g)
    h0: jax.Array,
    c0: jax.Array,
    interpret: bool = False,
) -> jax.Array:
    """Two-step low-rank h-side recurrence in one kernel.

    The two-step product writes straight into a (1, 4n) scratch using static
    column slices instead of concatenation: z[:r] = h@B, z[r:] = (h@B)@C —
    column order matches the dense gate order exactly (V₁ columns first), so
    gate math is unchanged.
    """
    T, g4 = xp.shape
    n = g4 // 4
    split = isinstance(uB, tuple)
    assert T <= _MAX_RESIDENT_T

    # Zero-width C matrices (full-rank gates) are skipped entirely — the
    # interpreter and Mosaic both reject 0-width operands.
    Bs = tuple(uB) if split else (uB,)
    Cs = tuple(uC) if split else (uC,)
    ranks = tuple(b.shape[1] for b in Bs)
    c_index = {}  # gate -> position within the C-operand block
    c_ops = []
    for g, C in enumerate(Cs):
        if C.shape[1] > 0:
            c_index[g] = len(c_ops)
            c_ops.append(C)
    ops = list(Bs) + c_ops
    nB = len(Bs)

    def kernel(*refs):
        xp_ref = refs[0]
        w_refs = refs[1 : 1 + len(ops)]
        h0_ref, c0_ref = refs[1 + len(ops) : 3 + len(ops)]
        out_ref = refs[3 + len(ops)]
        h_scr, c_scr, z_scr = refs[4 + len(ops) :]

        h_scr[:] = h0_ref[:]
        c_scr[:] = c0_ref[:]

        def body(t, _):
            h = h_scr[:]
            if split:
                for g in range(4):
                    r = ranks[g]
                    hb = _dot(h, w_refs[g][:])             # (1, r_g)
                    z_scr[:, g * n : g * n + r] = hb
                    if g in c_index:
                        z_scr[:, g * n + r : (g + 1) * n] = _dot(
                            hb, w_refs[nB + c_index[g]][:]
                        )
            else:
                r = ranks[0]
                hb = _dot(h, w_refs[0][:])                 # (1, r)
                z_scr[:, :r] = hb
                if 0 in c_index:
                    z_scr[:, r:] = _dot(hb, w_refs[nB + c_index[0]][:])
            z = z_scr[:] + xp_ref[pl.ds(t, 1), :]
            h_new, c_new = _gates(z, c_scr[:], n)
            h_scr[:] = h_new
            c_scr[:] = c_new
            out_ref[pl.ds(t, 1), :] = h_new
            return 0

        jax.lax.fori_loop(0, T, body, 0)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((T, n), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * (3 + len(ops)),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((1, n), jnp.float32),
            pltpu.VMEM((1, n), jnp.float32),
            pltpu.VMEM((1, 4 * n), jnp.float32),
        ],
        interpret=interpret,
    )(xp, *ops, h0, c0)


# ---------------------------------------------------------------------------
# fully-fused whole-model kernels (batch-1 streaming)
# ---------------------------------------------------------------------------

def fused_dense_stack_pallas(
    params: StackedLSTMParams, x: jax.Array, interpret: bool = False
) -> jax.Array:
    """Whole stacked model + head, one kernel. x: (T, d) -> y: (T, 1)."""
    T, d = x.shape
    units = [l.units for l in params.layers]
    L = len(units)
    assert T <= _MAX_RESIDENT_T

    ops = []
    for l in params.layers:
        ops += [l.W, l.U, l.b.reshape(1, -1)]
    ops += [params.head.w, params.head.b.reshape(1, -1)]

    def kernel(*refs):
        x_ref = refs[0]
        w_refs = refs[1 : 1 + 3 * L + 2]
        out_ref = refs[1 + 3 * L + 2]
        scr = refs[2 + 3 * L + 2 :]  # h0,c0,h1,c1,...

        for i in range(L):
            scr[2 * i][:] = jnp.zeros_like(scr[2 * i])
            scr[2 * i + 1][:] = jnp.zeros_like(scr[2 * i + 1])

        def body(t, _):
            inp = x_ref[pl.ds(t, 1), :]
            for i in range(L):
                W, U, b = w_refs[3 * i][:], w_refs[3 * i + 1][:], w_refs[3 * i + 2][:]
                z = _dot(inp, W) + _dot(scr[2 * i][:], U) + b
                h, c = _gates(z, scr[2 * i + 1][:], units[i])
                scr[2 * i][:] = h
                scr[2 * i + 1][:] = c
                inp = h
            y = _dot(inp, w_refs[3 * L][:]) + w_refs[3 * L + 1][:]
            out_ref[pl.ds(t, 1), :] = y
            return 0

        jax.lax.fori_loop(0, T, body, 0)

    scratch = []
    for n in units:
        scratch += [pltpu.VMEM((1, n), jnp.float32), pltpu.VMEM((1, n), jnp.float32)]

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((T, params.head.w.shape[1]), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * (1 + len(ops)),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
        interpret=interpret,
    )(x, *ops)


def fused_reduced_stack_pallas(
    params: ReducedModelParams, x: jax.Array, interpret: bool = False
) -> jax.Array:
    """Whole reduced (two-step) model + head, one kernel. x: (T, d) -> (T, 1)."""
    T, d = x.shape
    layers = params.layers
    units = [l.units for l in layers]
    L = len(layers)
    assert T <= _MAX_RESIDENT_T

    # Flatten weights; record per-layer op layout. Each (B, C) pair becomes
    # a B-operand index plus an optional C-operand index (None when the gate
    # is full-rank — zero-width operands are rejected by Mosaic).
    ops = []
    layouts = []  # per layer: (pairs, bias_index); pairs: list of
    #               (side, gate, B_idx, C_idx_or_None, rank)

    def add_pair(B, C):
        b_idx = len(ops)
        ops.append(B)
        c_idx = None
        if C.shape[1] > 0:
            c_idx = len(ops)
            ops.append(C)
        return b_idx, c_idx, B.shape[1]

    for l in layers:
        pairs = []
        if l.split:
            for g in range(4):
                pairs.append(("w", g, *add_pair(l.wB[g], l.wC[g])))
            for g in range(4):
                pairs.append(("u", g, *add_pair(l.uB[g], l.uC[g])))
        else:
            pairs.append(("w", None, *add_pair(l.wB, l.wC)))
            pairs.append(("u", None, *add_pair(l.uB, l.uC)))
        bias_index = len(ops)
        ops.append(l.b.reshape(1, -1))
        layouts.append((pairs, bias_index))
    head_idx = len(ops)
    ops += [params.head.w, params.head.b.reshape(1, -1)]

    def kernel(*refs):
        x_ref = refs[0]
        w_refs = refs[1 : 1 + len(ops)]
        out_ref = refs[1 + len(ops)]
        scr = refs[2 + len(ops) :]
        # scr layout: per layer h, c, zx, zu ; 4 per layer
        for i in range(L):
            scr[4 * i][:] = jnp.zeros_like(scr[4 * i])
            scr[4 * i + 1][:] = jnp.zeros_like(scr[4 * i + 1])

        def two_step_into(z_scr, xvec, b_idx, c_idx, col0, r, width):
            """z_scr[:, col0:col0+width] = [xvec@B, (xvec@B)@C]."""
            xb = _dot(xvec, w_refs[b_idx][:])
            z_scr[:, col0 : col0 + r] = xb
            if c_idx is not None:
                z_scr[:, col0 + r : col0 + width] = _dot(xb, w_refs[c_idx][:])

        def body(t, _):
            inp = x_ref[pl.ds(t, 1), :]
            for i, (pairs, bias_index) in enumerate(layouts):
                n = units[i]
                h_scr, c_scr = scr[4 * i], scr[4 * i + 1]
                zx, zu = scr[4 * i + 2], scr[4 * i + 3]
                for side, g, b_idx, c_idx, r in pairs:
                    z_scr = zx if side == "w" else zu
                    vec = inp if side == "w" else h_scr[:]
                    col0 = 0 if g is None else g * n
                    width = 4 * n if g is None else n
                    two_step_into(z_scr, vec, b_idx, c_idx, col0, r, width)
                z = zx[:] + zu[:] + w_refs[bias_index][:]
                h, c = _gates(z, c_scr[:], n)
                h_scr[:] = h
                c_scr[:] = c
                inp = h
            y = _dot(inp, w_refs[head_idx][:]) + w_refs[head_idx + 1][:]
            out_ref[pl.ds(t, 1), :] = y
            return 0

        jax.lax.fori_loop(0, T, body, 0)

    scratch = []
    for n in units:
        scratch += [
            pltpu.VMEM((1, n), jnp.float32),
            pltpu.VMEM((1, n), jnp.float32),
            pltpu.VMEM((1, 4 * n), jnp.float32),
            pltpu.VMEM((1, 4 * n), jnp.float32),
        ]

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((T, params.head.w.shape[1]), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * (1 + len(ops)),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
        interpret=interpret,
    )(x, *ops)


# ---------------------------------------------------------------------------
# jitted convenience wrappers (hybrid XLA-matmul + pallas-recurrence paths)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("interpret",))
def dense_forward_hybrid(
    params: StackedLSTMParams, x: jax.Array, interpret: bool = False
) -> jax.Array:
    """Per-layer hybrid: XLA big matmul for every layer's input projection,
    Pallas kernel for its recurrence. x: (T, d) -> y: (T, 1)."""
    h = x
    for l in params.layers:
        n = l.units
        xp = h @ l.W + l.b  # (T, 4n) — one MXU matmul
        h = lstm_recurrence_pallas(
            xp, l.U, jnp.zeros((1, n)), jnp.zeros((1, n)), interpret=interpret
        )
    return h @ params.head.w + params.head.b


@functools.partial(jax.jit, static_argnames=("interpret",))
def reduced_forward_hybrid(
    params: ReducedModelParams, x: jax.Array, interpret: bool = False
) -> jax.Array:
    """Hybrid path for the reduced model: two-step input projections as big
    XLA matmuls, two-step recurrence in Pallas."""
    from svd_lstm_tpu.models.reduced import reduced_projection

    h = x
    for l in params.layers:
        n = l.units
        xp = reduced_projection(l, h, "w") + l.b
        uB = tuple(l.uB) if l.split else l.uB
        uC = tuple(l.uC) if l.split else l.uC
        h = reduced_recurrence_pallas(
            xp, uB, uC, jnp.zeros((1, n)), jnp.zeros((1, n)), interpret=interpret
        )
    return h @ params.head.w + params.head.b
