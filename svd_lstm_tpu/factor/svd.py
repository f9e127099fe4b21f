"""SVD model surgery: dense → singular → reduced.

Rebuilds the reference's factorization pipeline
(code/svd_classes_v3.py:469-676) plus the v1 rank-manipulation utilities
(code/old_versions/svd_classes.py:9-21,210-232) as pure functions over
parameter pytrees.

Two reference bugs are fixed by design (SURVEY.md §2 C4/C9):
* the merged path's misspelled ``regularzier`` kwarg silently dropped the
  U/V regularizer (code/svd_classes_v3.py:54) — here regularizers are
  explicit loss terms, nothing can be silently dropped;
* ``make_LSTM_singular_model`` dropped the ``orthogonal`` argument when
  delegating to the split builder (code/svd_classes_v3.py:551-552) — here
  there is a single builder parameterized by ``merged``.

``V₁`` invertibility (slide 7 flags it) is handled with an explicit
conditioning check and an ``lstsq`` fallback.
"""

from __future__ import annotations

import warnings
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from svd_lstm_tpu.models.lstm import LSTMLayerParams, StackedLSTMParams
from svd_lstm_tpu.models.reduced import ReducedLayerParams, ReducedModelParams
from svd_lstm_tpu.models.singular import SingularLayerParams, SingularModelParams

_COND_LIMIT = 1e8  # V1 conditioning guard (slide 7: "U₁ may not be invertible")


# ---------------------------------------------------------------------------
# dense -> singular
# ---------------------------------------------------------------------------

def _svd(mat: np.ndarray):
    return np.linalg.svd(np.asarray(mat, dtype=np.float64), full_matrices=False)


def factorize_lstm_params(
    layer: LSTMLayerParams, merged_kernel: bool = False, dtype=jnp.float32
) -> SingularLayerParams:
    """Factorize one dense layer's kernels as U·Σ·Vᵀ.

    merged: one SVD of the whole (d×4n) / (n×4n) matrix
            (reference code/svd_classes_v3.py:560-564);
    split:  one SVD per gate block, factors stacked on a leading gate axis
            (reference code/svd_classes_v3.py:482-502 concatenates instead).
    """
    W = np.asarray(layer.W, dtype=np.float64)
    U = np.asarray(layer.U, dtype=np.float64)
    b = np.asarray(layer.b, dtype=np.float64)
    n = layer.units

    if merged_kernel:
        wl, ws, wr = _svd(W)
        ul, us, ur = _svd(U)
    else:
        w_parts = [_svd(W[:, g * n : (g + 1) * n]) for g in range(4)]
        u_parts = [_svd(U[:, g * n : (g + 1) * n]) for g in range(4)]
        wl = np.stack([p[0] for p in w_parts])
        ws = np.stack([p[1] for p in w_parts])
        wr = np.stack([p[2] for p in w_parts])
        ul = np.stack([p[0] for p in u_parts])
        us = np.stack([p[1] for p in u_parts])
        ur = np.stack([p[2] for p in u_parts])

    return SingularLayerParams(
        wl=jnp.asarray(wl, dtype),
        ws=jnp.asarray(ws, dtype),
        wr=jnp.asarray(wr, dtype),
        ul=jnp.asarray(ul, dtype),
        us=jnp.asarray(us, dtype),
        ur=jnp.asarray(ur, dtype),
        b=jnp.asarray(b, dtype),
    )


def make_singular_model(
    params: StackedLSTMParams, merged_kernel: bool = False, dtype=jnp.float32
) -> SingularModelParams:
    """dense model -> singular model (reference make_LSTM_singular_model,
    code/svd_classes_v3.py:548-598). The dense head is copied unchanged."""
    layers = tuple(
        factorize_lstm_params(l, merged_kernel, dtype) for l in params.layers
    )
    return SingularModelParams(layers=layers, head=params.head)


# ---------------------------------------------------------------------------
# singular -> reduced (two-step truncation)
# ---------------------------------------------------------------------------

def _truncate_factors(
    left: np.ndarray,
    sigma: np.ndarray,
    right: np.ndarray,
    cutoff: float | None,
    rank: int | None,
) -> Tuple[np.ndarray, np.ndarray]:
    """(U, σ, Vᵀ) -> exact two-step (B, C) after dropping small σ.

    B = (U·Σ)·V₁ and C = V₁⁻¹·V₂ (reference code/svd_classes_v3.py:617-627).
    Selection keeps components BY MAGNITUDE — threshold |σ| > cutoff, or
    the top ``rank`` by |σ|. After a fine-tune the σ vector is no longer
    descending or even non-negative (Hoyer is sign-symmetric; gradient
    updates can push an entry through zero), so the reference's signed
    compare (``sigma > cutoff``, code/svd_classes_v3.py:619-621) would
    drop a σ of −0.8 "below" a 0.05 cutoff — a reconstruction error far
    above the cutoff contract. Identical to the reference's rule for a
    freshly factorized model, where σ ≥ 0.
    """
    left = np.asarray(left, np.float64)
    sigma = np.asarray(sigma, np.float64)
    right = np.asarray(right, np.float64)
    if rank is not None:
        mask = np.zeros(sigma.shape, bool)
        # stable descending sort: ties keep their original (descending-σ)
        # order, so a freshly factorized model — including the degenerate
        # all-equal σ of an orthogonal-initialized recurrent kernel —
        # truncates exactly as the first-r rule did
        mask[np.argsort(-np.abs(sigma), kind="stable")[:rank]] = True
    elif cutoff is not None:
        mask = np.abs(sigma) > cutoff
    else:
        raise ValueError(
            "truncation needs a selection rule: pass cutoff= (σ threshold) "
            "or rank= (top-r by magnitude)"
        )
    if not mask.any():
        # Keep at least the largest-|σ| component; an all-zero gate would
        # make V1 empty and the two-step undefined.
        mask[np.argmax(np.abs(sigma))] = True
    U = left[:, mask]
    S = sigma[mask]
    V = right[mask, :]
    r = V.shape[0]
    V1, V2 = V[:, :r], V[:, r:]
    B = (U * S) @ V1
    cond = np.linalg.cond(V1)
    if not np.isfinite(cond) or cond > _COND_LIMIT:
        warnings.warn(
            f"V1 ill-conditioned (cond={cond:.3e}); using least-squares for C",
            RuntimeWarning,
        )
        C = np.linalg.lstsq(V1, V2, rcond=None)[0]
    else:
        C = np.linalg.solve(V1, V2)
    return B, C


def truncate_singular_layer(
    p: SingularLayerParams,
    cutoff: float | None = 0.05,
    rank: int | None = None,
    dtype=jnp.float32,
) -> ReducedLayerParams:
    """Truncate one singular layer to the exact two-step reduced form."""
    b = jnp.asarray(np.asarray(p.b), dtype)
    if p.split:
        wB, wC, uB, uC = [], [], [], []
        for g in range(4):
            Bw, Cw = _truncate_factors(p.wl[g], p.ws[g], p.wr[g], cutoff, rank)
            Bu, Cu = _truncate_factors(p.ul[g], p.us[g], p.ur[g], cutoff, rank)
            wB.append(jnp.asarray(Bw, dtype))
            wC.append(jnp.asarray(Cw, dtype))
            uB.append(jnp.asarray(Bu, dtype))
            uC.append(jnp.asarray(Cu, dtype))
        return ReducedLayerParams(
            wB=tuple(wB), wC=tuple(wC), uB=tuple(uB), uC=tuple(uC), b=b
        )
    Bw, Cw = _truncate_factors(p.wl, p.ws, p.wr, cutoff, rank)
    Bu, Cu = _truncate_factors(p.ul, p.us, p.ur, cutoff, rank)
    return ReducedLayerParams(
        wB=jnp.asarray(Bw, dtype),
        wC=jnp.asarray(Cw, dtype),
        uB=jnp.asarray(Bu, dtype),
        uC=jnp.asarray(Cu, dtype),
        b=b,
    )


def make_reduced_model(
    smodel: SingularModelParams,
    cutoff: float | None = 0.05,
    rank: int | None = None,
    dtype=jnp.float32,
) -> ReducedModelParams:
    """singular model -> reduced model (reference make_LSTM_reduced_model,
    code/svd_classes_v3.py:604-676)."""
    layers = tuple(
        truncate_singular_layer(l, cutoff=cutoff, rank=rank, dtype=dtype)
        for l in smodel.layers
    )
    return ReducedModelParams(layers=layers, head=smodel.head)


def singular_to_dense(smodel: SingularModelParams, dtype=jnp.float32) -> StackedLSTMParams:
    """Collapse a singular model back to dense parameters — exact
    (W = (U·Σ)·Vᵀ per matrix / per gate). Inverse of ``make_singular_model``
    up to float rounding; used for export and for running a fine-tuned
    singular model on the dense fast path. Pure jnp so it traces under jit
    (``api.predict`` reaches it through the fused batch-1 route and is
    itself jittable); for gradients through the reconstruction use
    ``ops.singular_train.singular_dense_view``, which skips the dtype cast."""
    # One canonical reconstruction: _dense_matrix is the layout-critical
    # gate-ordering code shared with the differentiable training view.
    # Imported lazily — the ops package pulls in the Pallas modules.
    from svd_lstm_tpu.ops.singular_train import _dense_matrix

    layers = tuple(
        LSTMLayerParams(
            W=_dense_matrix(p.wl, p.ws, p.wr).astype(dtype),
            U=_dense_matrix(p.ul, p.us, p.ur).astype(dtype),
            b=jnp.asarray(p.b, dtype),
        )
        for p in smodel.layers
    )
    return StackedLSTMParams(layers=layers, head=smodel.head)


# ---------------------------------------------------------------------------
# conv-hybrid surgery: the same pipeline over the Conv1D+LSTM family
# ---------------------------------------------------------------------------
#
# The reference factorizes only pure LSTM stacks (code/svd_classes_v3.py:548)
# and its conv experiment (code/old_versions/toy-convolution.py:70-76) never
# meets the compression pipeline. These close the square: the conv front end
# is carried through unchanged (a 10×1×15 kernel is below any payable rank)
# while the LSTM stack goes through the identical dense→singular→reduced
# surgery.


def make_conv_singular_model(params, merged_kernel: bool = False, dtype=jnp.float32):
    """Conv hybrid -> conv + factorized stack (``ConvSingularParams``)."""
    from svd_lstm_tpu.models.conv import ConvLSTMParams, ConvSingularParams

    if not isinstance(params, ConvLSTMParams):
        raise TypeError(f"expected ConvLSTMParams, got {type(params).__name__}")
    inner = make_singular_model(
        StackedLSTMParams(layers=params.layers, head=params.head),
        merged_kernel,
        dtype,
    )
    return ConvSingularParams(conv=params.conv, inner=inner)


def make_conv_reduced_model(
    cparams, cutoff: float | None = 0.05, rank: int | None = None, dtype=jnp.float32
):
    """Conv + singular stack -> conv + truncated two-step stack."""
    from svd_lstm_tpu.models.conv import ConvReducedParams, ConvSingularParams

    if not isinstance(cparams, ConvSingularParams):
        raise TypeError(f"expected ConvSingularParams, got {type(cparams).__name__}")
    return ConvReducedParams(
        conv=cparams.conv,
        inner=make_reduced_model(cparams.inner, cutoff=cutoff, rank=rank, dtype=dtype),
    )


def conv_singular_to_dense(cparams, dtype=jnp.float32):
    """Collapse a fine-tuned conv hybrid back to the dense family — exact,
    the conv front end untouched (inverse of ``make_conv_singular_model``)."""
    from svd_lstm_tpu.models.conv import ConvLSTMParams, ConvSingularParams

    if not isinstance(cparams, ConvSingularParams):
        raise TypeError(f"expected ConvSingularParams, got {type(cparams).__name__}")
    dense = singular_to_dense(cparams.inner, dtype)
    return ConvLSTMParams(conv=cparams.conv, layers=dense.layers, head=dense.head)


# ---------------------------------------------------------------------------
# v1 rank utilities (reference code/old_versions/svd_classes.py)
# ---------------------------------------------------------------------------

def reduce_matrix_rank(a: np.ndarray, rank: int) -> np.ndarray:
    """Zero trailing singular values and reconstruct
    (reference old_versions/svd_classes.py:9-12)."""
    u, s, v = np.linalg.svd(np.asarray(a, np.float64), full_matrices=False)
    s = s.copy()
    s[rank:] = 0.0
    return (u * s) @ v


def two_step_factors(a: np.ndarray, rank: int) -> Tuple[np.ndarray, np.ndarray]:
    """Column-convention two-step factors of the rank-``rank`` approximation:
    x @ a ≈ concat(x @ B, (x @ B) @ C). Exact when rank(a) ≤ rank."""
    u, s, v = np.linalg.svd(np.asarray(a, np.float64), full_matrices=False)
    return _truncate_factors(u, s, v, cutoff=None, rank=rank)


def reduce_two_step(a: np.ndarray, rank: int) -> list:
    """Row-convention (W @ x) two-step pair, v1-API parity
    (reference old_versions/svd_classes.py:14-21): returns [D, E] with
    (W @ x)[:r] = D @ x and (W @ x)[r:] = E @ (D @ x)."""
    B, C = two_step_factors(np.asarray(a).T, rank)
    return [B.T, C.T]


def get_model_singular_values(params: StackedLSTMParams) -> np.ndarray:
    """Per-gate singular values of every W/U block: (layers, 2, 4, units).

    Intended semantics of reference old_versions/svd_classes.py:220-232 (the
    reference computes whole-matrix σ for each gate slot, which is
    inconsistent with its per-gate ``set_model_matrix_rank``; here the values
    really are per-gate)."""
    L = len(params.layers)
    # size the σ axis to the WIDEST layer — a widening stack (e.g. 40→80)
    # has per-gate σ vectors of different lengths; trailing slots stay 0
    units = max(layer.units for layer in params.layers)
    out = np.zeros((L, 2, 4, units))
    for i, layer in enumerate(params.layers):
        n = layer.units
        for j, M in enumerate([np.asarray(layer.W), np.asarray(layer.U)]):
            for g in range(4):
                s = np.linalg.svd(M[:, g * n : (g + 1) * n], compute_uv=False)
                out[i, j, g, : s.size] = s
    return out


def set_model_matrix_rank(
    params: StackedLSTMParams, index: Tuple[int, int, int], rank: int
) -> StackedLSTMParams:
    """Functionally rank-reduce one gate block in place of the reference's
    mutating version (old_versions/svd_classes.py:210-217).

    index = (layer, 0 for W / 1 for U, gate)."""
    li, wj, g = index
    layer = params.layers[li]
    n = layer.units
    M = np.asarray(layer.W if wj == 0 else layer.U).copy()
    blk = M[:, g * n : (g + 1) * n]
    M[:, g * n : (g + 1) * n] = reduce_matrix_rank(blk, rank)
    M = jnp.asarray(M, layer.W.dtype)
    new_layer = layer._replace(W=M) if wj == 0 else layer._replace(U=M)
    layers = list(params.layers)
    layers[li] = new_layer
    return params._replace(layers=tuple(layers))
