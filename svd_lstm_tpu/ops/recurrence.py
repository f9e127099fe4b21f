"""XLA (lax.scan) recurrence primitives shared by model applies and used as
the reference implementation for the Pallas kernels.

Each function consumes a precomputed input projection ``xp`` (the x-side of
the cell, bias included, hoisted out of the recurrence as one big MXU
matmul) and runs only the hidden-state product sequentially — the TPU-native
replacement for the reference's per-step ``backend.rnn`` interpreter
(reference code/svd_classes_v3.py:408-419).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from svd_lstm_tpu.models.lstm import gate_update


def lstm_recurrence_xla(
    xp: jax.Array,  # (B, T, 4n) input projection incl. bias
    U: jax.Array,   # (n, 4n)
    h0: jax.Array,  # (B, n)
    c0: jax.Array,  # (B, n)
) -> jax.Array:
    """Dense recurrence: h_seq (B, T, n)."""
    xp_t = jnp.swapaxes(xp, 0, 1)

    def step(carry, x):
        h, c = carry
        h, c = gate_update(x + h @ U, c)
        return (h, c), h

    _, h_seq = jax.lax.scan(step, (h0, c0), xp_t)
    return jnp.swapaxes(h_seq, 0, 1)


def reduced_recurrence_xla(
    xp: jax.Array,
    uB,  # merged: (n, r); split: 4-tuple of (n, r_g)
    uC,  # merged: (r, 4n-r); split: 4-tuple of (r_g, n-r_g)
    h0: jax.Array,
    c0: jax.Array,
) -> jax.Array:
    """Two-step low-rank recurrence (exact reduced cell)."""
    split = isinstance(uB, tuple)
    xp_t = jnp.swapaxes(xp, 0, 1)

    def rec(h):
        if split:
            parts = []
            for B_, C_ in zip(uB, uC):
                hb = h @ B_
                parts.append(jnp.concatenate([hb, hb @ C_], axis=-1))
            return jnp.concatenate(parts, axis=-1)
        hb = h @ uB
        return jnp.concatenate([hb, hb @ uC], axis=-1)

    def step(carry, x):
        h, c = carry
        h, c = gate_update(x + rec(h), c)
        return (h, c), h

    _, h_seq = jax.lax.scan(step, (h0, c0), xp_t)
    return jnp.swapaxes(h_seq, 0, 1)
