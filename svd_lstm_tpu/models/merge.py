"""Parallel→sequential LSTM weight merging.

Parity with the reference's model-merging surgery
(code/old_versions/sequentialize.py:2-48, used by
old_versions/train_full_model.py:156-183 to splice two pretrained toy
LSTMs — 'frequency' and 'amplitude' — into one wider stacked layer):

Given two cells with weights (W₁,U₁,b₁), (W₂,U₂,b₂), build one cell of
width n₁+n₂ whose hidden state is the concatenation of the two originals:

* per-gate kernel columns interleave as [gate₁ | gate₂];
* if ``same_x`` both cells read the same input (kernel rows stack as-is);
  otherwise inputs concatenate and the kernel is per-gate block-diagonal;
* the recurrent kernel is always per-gate block-diagonal (no cross-talk —
  the merged cell computes exactly what the two parallel cells computed).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from svd_lstm_tpu.models.lstm import LSTMLayerParams


def merge_parallel_cell_weights(
    cell1: LSTMLayerParams, cell2: LSTMLayerParams, same_x: bool = False
) -> LSTMLayerParams:
    W1, U1, b1 = np.asarray(cell1.W), np.asarray(cell1.U), np.asarray(cell1.b)
    W2, U2, b2 = np.asarray(cell2.W), np.asarray(cell2.U), np.asarray(cell2.b)
    n1, n2 = U1.shape[0], U2.shape[0]
    d1, d2 = W1.shape[0], W2.shape[0]

    def gate(M, n, g):
        return M[:, g * n : (g + 1) * n]

    W_blocks = []
    for g in range(4):
        g1, g2 = gate(W1, n1, g), gate(W2, n2, g)
        if same_x:
            if d1 != d2:
                raise ValueError("same_x requires identical input dims")
            W_blocks.append(np.concatenate([g1, g2], axis=1))
        else:
            blk = np.zeros((d1 + d2, n1 + n2), W1.dtype)
            blk[:d1, :n1] = g1
            blk[d1:, n1:] = g2
            W_blocks.append(blk)
    W = np.concatenate(W_blocks, axis=1)

    U_blocks = []
    for g in range(4):
        blk = np.zeros((n1 + n2, n1 + n2), U1.dtype)
        blk[:n1, :n1] = gate(U1, n1, g)
        blk[n1:, n1:] = gate(U2, n2, g)
        U_blocks.append(blk)
    U = np.concatenate(U_blocks, axis=1)

    b = np.concatenate(
        [np.concatenate([b1[g * n1 : (g + 1) * n1], b2[g * n2 : (g + 1) * n2]]) for g in range(4)]
    )
    return LSTMLayerParams(W=jnp.asarray(W), U=jnp.asarray(U), b=jnp.asarray(b))
