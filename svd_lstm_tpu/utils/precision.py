"""Precision casting for inference.

bfloat16 weights halve HBM/VMEM traffic and run natively on the MXU — the
right mode for throughput-bound wide-model inference. Gate math stays in
f32 (XLA accumulates bf16 matmuls in f32 by default). The framework default
remains full f32 for exact-reconstruction parity with the reference.
"""

from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp

# Named inference precision modes (measured trade-offs in BENCH_NOTES.md):
# 'exact' = f32-forced matmul passes (package default), 'high' = 3-pass bf16
# (~1e-4 rel.err), 'fast' = bf16 params + activations (~1e-2).
PRECISION_MODES = ("exact", "high", "fast")


def matmul_scope(precision: str):
    """Context manager selecting the matmul passes for a named precision
    mode. 'high' relaxes to 3-pass bf16; 'exact' and 'fast' are no-op scopes
    ('fast' gets its speed from bf16-cast operands, see :func:`cast_params`)."""
    if precision not in PRECISION_MODES:
        raise ValueError(f"unknown precision: {precision!r}")
    if precision == "high":
        return jax.default_matmul_precision("tensorfloat32")
    return contextlib.nullcontext()


def cast_params(params, dtype=jnp.bfloat16):
    """Cast every floating leaf of a parameter pytree."""
    def cast(x):
        if jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree.map(cast, params)
