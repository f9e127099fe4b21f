"""Regularizers for singular-value sparsification and factor orthogonality.

* ``hoyer_penalty`` — the Hoyer L1/L2 ratio (reference HoyerRegularizer,
  code/svd_classes_v3.py:455-465): scale-invariant pressure that sparsifies
  a vector without shrinking its energy. The reference's raw ratio has an
  unguarded denominator (stiff near 0, SURVEY.md §7 hard part (d)); here the
  denominator carries an epsilon.
* ``orthogonal_penalty`` — keras.regularizers.OrthogonalRegularizer
  semantics (mode='rows'), used on the U/V factors when they are trainable
  (reference code/svd_classes_v3.py:513-518,572-577): mean absolute
  off-diagonal entry of the row-normalized Gram matrix, halved.
* ``trace_norm_penalty`` — beyond-reference alternative sparsifier: an L1
  penalty on a σ vector of an (orthogonal-factor) SVD parameterization is
  exactly the nuclear/trace norm ‖W‖* of the reconstructed matrix, the
  convex surrogate for rank (trace-norm regularization for faster RNN
  inference, arxiv 1710.09026; see PAPERS.md). Unlike the Hoyer ratio it
  shrinks total energy — constant pressure per σ regardless of scale —
  which truncates more aggressively at a fixed cutoff but trades accuracy
  sooner.
"""

from __future__ import annotations

import jax.numpy as jnp


def hoyer_penalty(x: jnp.ndarray, coef: float = 1.0, eps: float = 1e-12) -> jnp.ndarray:
    """coef * Σ|x| / (Σx² + eps)."""
    x = x.reshape(-1)
    return coef * jnp.sum(jnp.abs(x)) / (jnp.sum(jnp.square(x)) + eps)


def trace_norm_penalty(x: jnp.ndarray, coef: float = 1.0) -> jnp.ndarray:
    """coef * Σ|x| — the nuclear norm of the factorized matrix when ``x``
    is its singular-value vector (factors orthogonal, as SVD surgery
    initializes them)."""
    return coef * jnp.sum(jnp.abs(x))


def orthogonal_penalty(
    m: jnp.ndarray, factor: float = 1.0, mode: str = "rows", eps: float = 1e-12
) -> jnp.ndarray:
    """factor * 0.5 * mean_|offdiag| of the normalized Gram matrix.

    mode='rows': gram = normalize_rows(m) @ normalize_rows(m)ᵀ;
    mode='columns': the transpose convention. Matches Keras ≥2.10.

    Split factors (leading gate axis, ndim==3, shape (4, a, b)) are
    penalized as the COLUMN-CONCATENATED (a, 4b) matrix — the reference
    stores split factors concatenated (code/svd_classes_v3.py:74-107) and
    regularizes that whole matrix, so rows normalize across all four
    gates jointly; a per-gate average gives different gradients.
    """
    if m.ndim == 3:
        g, a, b = m.shape
        m = jnp.transpose(m, (1, 0, 2)).reshape(a, g * b)
    if mode == "columns":
        m = m.T
    size = m.shape[0]
    if size < 2:
        # a single row/column has no off-diagonal pairs; 0/0 here would
        # silently turn the fine-tune loss into NaN (e.g. d=1 inputs)
        return jnp.zeros((), m.dtype) * factor
    norm = jnp.sqrt(jnp.sum(jnp.square(m), axis=1, keepdims=True) + eps)
    mn = m / norm
    gram = mn @ mn.T
    off = jnp.abs(gram - jnp.diag(jnp.diag(gram)))
    num_pairs = size * (size - 1.0) / 2.0
    return factor * 0.5 * jnp.sum(off) / num_pairs
