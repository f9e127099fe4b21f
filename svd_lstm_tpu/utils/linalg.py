"""Shared padding / folding helpers used by model applies and kernels."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pad_rows(M: jax.Array, rows: int) -> jax.Array:
    out = jnp.zeros((rows, M.shape[1]), M.dtype)
    return out.at[: M.shape[0]].set(M)


def pad_cols(M: jax.Array, cols: int) -> jax.Array:
    out = jnp.zeros((M.shape[0], cols), M.dtype)
    return out.at[:, : M.shape[1]].set(M)


def pad_gate_cols(M: jax.Array, n: int, npg: int) -> jax.Array:
    """(rows, 4n) -> (rows, 4*npg), gate g at lanes [g*npg, g*npg+n)."""
    rows = M.shape[0]
    out = jnp.zeros((rows, 4 * npg), M.dtype)
    for g in range(4):
        out = out.at[:, g * npg : g * npg + n].set(M[:, g * n : (g + 1) * n])
    return out


def fold_IC(B: jax.Array, C: jax.Array) -> jax.Array:
    """[I | C]: (r, r + C.cols). (x@B) @ [I|C] == concat(x@B, (x@B)@C) —
    the folded form of the exact two-step product (no concatenation)."""
    r = B.shape[1]
    eye = jnp.eye(r, dtype=B.dtype)
    return jnp.concatenate([eye, C], axis=1) if C.shape[1] else eye
