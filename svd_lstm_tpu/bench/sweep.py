"""Rank-reduction sweep: RMSE-vs-rank curves.

Parity with the v1 sweep that produced the published RMSE_plot.png
(reference code/old_versions/svd_acceleration.py:61-103 and
LSTM_wrapper.iterate_reduce_model, old_versions/svd_classes.py:139-182):

1. compute every gate block's singular values (layers × {W,U} × 4 gates);
2. order ALL of them ascending ("absolute" heuristic);
3. iteratively zero the next-smallest σ (rank-reduce that gate block in
   place), re-evaluating whole-run RMSE at the un-reduced baseline, every
   ``evaluate_every`` applied reductions, and at the final state;
4. track eliminated-weight counts with the slide-9 two-step accounting
   (eliminating one rank of an m×n block saves m + n − 2·r_new − 1 stored
   weights);
5. optional early stop when RMSE ratio crosses a threshold;
6. optionally retain per-eval predictions (for the reduce_rank.gif).

The whole sweep runs on-device: one jitted whole-run forward re-used across
iterations; only the mutated gate block is re-uploaded.
"""

from __future__ import annotations

import dataclasses
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from svd_lstm_tpu.config import SweepConfig
from svd_lstm_tpu.factor.svd import (
    get_model_singular_values,
    set_model_matrix_rank,
)
from svd_lstm_tpu.models.lstm import StackedLSTMParams, stacked_lstm_apply
from svd_lstm_tpu.train.metrics import rmse as rmse_fn


@dataclasses.dataclass
class SweepResult:
    rmse: np.ndarray                 # RMSE at each evaluation
    rmse_ratio: np.ndarray           # rmse / rmse[0]
    weights_eliminated: np.ndarray   # cumulative, aligned with evaluations
    reductions_done: int
    order: np.ndarray                # (iters, 4) sorted (layer, W/U, gate, σ-idx)
    predictions: List[np.ndarray]    # per-eval whole-run predictions (optional)


def sorted_sigma_indices(
    params: StackedLSTMParams,
    protect_first_layer_w: bool = True,
    heuristic: str = "absolute",
) -> np.ndarray:
    """All (layer, W/U, gate, σ-index) quadruples ordered by the drop
    heuristic (reference old_versions/svd_acceleration.py:64-68; the
    'smarter drop metrics' knob its TODO asked for):

    * 'absolute' — ascending raw σ (the reference's only heuristic);
    * 'relative' — σ normalized by its matrix's largest σ, so large- and
      small-scale gate blocks compete fairly.
    """
    sv = get_model_singular_values(params)  # (L, 2, 4, units)
    if heuristic == "relative":
        scale = sv.max(axis=-1, keepdims=True)
        key = sv / np.where(scale == 0, 1.0, scale)
    elif heuristic == "absolute":
        key = sv
    else:
        raise ValueError(f"unknown heuristic {heuristic!r}")
    order = np.stack(np.unravel_index(np.argsort(key.ravel()), sv.shape), axis=1)
    if protect_first_layer_w:
        keep = ~((order[:, 0] == 0) & (order[:, 1] == 0))
        order = order[keep]
    # skip σ-slots that are structurally zero (e.g. W blocks with d < n have
    # only d nonzero σ; zeroing a zero does nothing but wastes an iteration)
    nz = sv[order[:, 0], order[:, 1], order[:, 2], order[:, 3]] > 1e-12
    return order[nz]


def rank_sweep(
    params: StackedLSTMParams,
    X: np.ndarray,                  # (1, T, d)
    y_true_scaled: np.ndarray,      # (T,) physical units
    inverse_transform,              # scaler.inverse_transform
    cfg: SweepConfig = SweepConfig(),
    max_reductions: int | None = None,
    keep_predictions: bool = False,
) -> SweepResult:
    order = sorted_sigma_indices(params, cfg.protect_first_layer_w)
    if max_reductions is not None:
        order = order[:max_reductions]

    # conv hybrids sweep too: get_model_singular_values /
    # set_model_matrix_rank operate on .layers, which ConvLSTMParams also
    # carries (the conv kernel is not a gate block, so it never appears in
    # the σ ordering); only the forward needs the family dispatch
    apply_fn = stacked_lstm_apply
    if hasattr(params, "conv"):
        from svd_lstm_tpu.models.conv import conv_lstm_apply

        apply_fn = conv_lstm_apply
    forward = jax.jit(lambda p, xx: apply_fn(p, xx, return_sequences=True))
    X = jnp.asarray(X, jnp.float32)

    # current rank of each (layer, W/U, gate) block
    ranks = {}
    for layer_i, layer in enumerate(params.layers):
        n = layer.units
        d = layer.W.shape[0]
        for g in range(4):
            ranks[(layer_i, 0, g)] = min(d, n)
            ranks[(layer_i, 1, g)] = n

    rmses, weights_elim, preds = [], [], []
    running_weights = 0

    def evaluate():
        pred = np.asarray(forward(params, X))[0, :, 0]
        pred_scaled = inverse_transform(pred.reshape(-1, 1)).ravel()
        rmses.append(rmse_fn(y_true_scaled, pred_scaled))
        weights_elim.append(running_weights)
        if keep_predictions:
            preds.append(pred_scaled)

    evaluate()  # baseline: 0 reductions (also covers an empty order)
    reductions = 0
    since_eval = 0
    stopped = False
    for layer_i, wu, gate, _sigma_idx in order:
        key = (int(layer_i), int(wu), int(gate))
        new_rank = ranks[key] - 1
        if new_rank < 1:
            continue  # rank-1 floor: not a reduction, not counted
        ranks[key] = new_rank
        params = set_model_matrix_rank(params, key, new_rank)
        layer = params.layers[key[0]]
        m = layer.W.shape[0] if wu == 0 else layer.units
        n = layer.units
        running_weights += m + n - 2 * new_rank - 1
        reductions += 1
        since_eval += 1
        if since_eval >= cfg.evaluate_every:
            evaluate()
            since_eval = 0
            base = max(rmses[0], 1e-300)
            if cfg.threshold is not None and rmses[-1] / base > cfg.threshold:
                stopped = True
                break
    if since_eval > 0 and not stopped:
        evaluate()  # the FINAL state is always measured

    rmses_arr = np.asarray(rmses)
    return SweepResult(
        rmse=rmses_arr,
        rmse_ratio=rmses_arr / max(rmses_arr[0], 1e-300),
        weights_eliminated=np.asarray(weights_elim),
        reductions_done=reductions,
        order=order,
        predictions=preds,
    )
