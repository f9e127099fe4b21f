"""SVD-factorized ("singular") LSTM layer.

Each kernel is parameterized as a three-step product with the singular-value
vector as the trainable bottleneck (reference code/svd_classes_v3.py:17-236):

* merged kernel:  z = ((x @ w_left) * w_sigma) @ w_right, with
  ``w_left = U`` (d×d), ``w_sigma = Σ`` (d,), ``w_right = Vᵀ`` (d×4n) from
  one SVD of the whole (d × 4n) matrix (reference :116-145);
* split kernel: the same per gate, with the four gates' factors stacked on a
  leading gate axis — the reference stores them concatenated column-wise
  (code/svd_classes_v3.py:146-232); stacking lets the whole 4-gate product
  run as two batched einsums instead of 12 separate matmuls.

The layout is detected from ``w_left.ndim`` (3 ⇒ split), so the params stay a
clean pytree with no static flags.

Like the dense layer, the full three-step *input* product is hoisted out of
the recurrence (the sequence is known ahead of time); only the hidden-state
three-step product runs inside ``lax.scan``.

During fine-tuning only the σ vectors receive gradients unless ``train_uv``
is enabled (reference `train_uv`, code/svd_classes_v3.py:51-107) — handled by
the optimizer mask in ``svd_lstm_tpu.train.finetune``, not by the forward.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from svd_lstm_tpu.models.lstm import DenseParams, chunked_remat_scan, gate_update
from svd_lstm_tpu.utils.linalg import zeros_varying_like


class SingularLayerParams(NamedTuple):
    # merged: wl (d, d);   ws (d,);    wr (d, 4n)
    # split:  wl (4, d, k); ws (4, k); wr (4, k, n)   with k = min(d, n)
    wl: jax.Array
    ws: jax.Array
    wr: jax.Array
    # merged: ul (n, n);   us (n,);    ur (n, 4n)
    # split:  ul (4, n, n); us (4, n); ur (4, n, n)
    ul: jax.Array
    us: jax.Array
    ur: jax.Array
    b: jax.Array  # (4n,)

    @property
    def split(self) -> bool:
        return self.wl.ndim == 3

    @property
    def units(self) -> int:
        return self.ul.shape[-2]

    @property
    def input_dim(self) -> int:
        return self.wl.shape[1] if self.split else self.wl.shape[0]


class SingularModelParams(NamedTuple):
    layers: Tuple[SingularLayerParams, ...]
    head: DenseParams


def _three_step_merged(x, left, sigma, right):
    """((x @ left) * sigma) @ right — reference code/svd_classes_v3.py:129-131."""
    return ((x @ left) * sigma) @ right


def _three_step_split(x, left, sigma, right):
    """Per-gate three-step product, batched over the gate axis.

    x: (..., d); left: (4, d, k); sigma: (4, k); right: (4, k, n).
    Returns (..., 4n) with gate blocks ordered [i|f|c|o].
    """
    xg = jnp.einsum("...d,gdk->...gk", x, left) * sigma
    zg = jnp.einsum("...gk,gkn->...gn", xg, right)
    return zg.reshape(*zg.shape[:-2], -1)


def singular_input_projection(p: SingularLayerParams, x_seq: jax.Array) -> jax.Array:
    """Input product + bias over any leading dims: (..., d) -> (..., 4n)
    (whole sequences batch- or time-major, or one (B, d) frame)."""
    if p.split:
        return _three_step_split(x_seq, p.wl, p.ws, p.wr) + p.b
    return _three_step_merged(x_seq, p.wl, p.ws, p.wr) + p.b


def singular_recurrent_product(p: SingularLayerParams, h: jax.Array) -> jax.Array:
    if p.split:
        return _three_step_split(h, p.ul, p.us, p.ur)
    return _three_step_merged(h, p.ul, p.us, p.ur)


def dropout_masks(rng, rate: float, shape, count: int, dtype):
    """``count`` inverted-scaled Bernoulli keep-masks, drawn ONCE (so they
    are constant across every timestep of the scan — Keras
    ``get_dropout_mask_for_cell`` semantics, reference
    code/svd_classes_v3.py:121-124)."""
    keep = 1.0 - rate
    return jax.random.bernoulli(rng, keep, (count, *shape)).astype(dtype) / keep


def _masked_input_projection(p, x_seq, dp):
    """Input three-step product with dropout masks applied to the inputs.

    Merged path multiplies the inputs by ONE mask (reference
    code/svd_classes_v3.py:125-126 uses dp_mask[0] only); the split path
    masks per gate (reference :154-163 feeds inputs_i..inputs_o through the
    per-gate factor chains).
    """
    if p.split:
        # (B, T, 4, d): gate-masked inputs, mask constant across time
        xm = x_seq[:, :, None, :] * jnp.transpose(dp, (1, 0, 2))[:, None]
        xg = jnp.einsum("btgd,gdk->btgk", xm, p.wl) * p.ws
        xp = jnp.einsum("btgk,gkn->btgn", xg, p.wr)
        return xp.reshape(*xp.shape[:-2], -1) + p.b
    return _three_step_merged(x_seq * dp[0][:, None, :], p.wl, p.ws, p.wr) + p.b


def _masked_recurrent_product(p, h, rdp):
    """Recurrent three-step product with recurrent-dropout masks on h_{t-1}
    (reference code/svd_classes_v3.py:135-137 merged, :196-205 split)."""
    if p.split:
        hm = h[:, None, :] * jnp.transpose(rdp, (1, 0, 2))  # (B, 4, n)
        hg = jnp.einsum("bgn,gnk->bgk", hm, p.ul) * p.us
        z = jnp.einsum("bgk,gkn->bgn", hg, p.ur)
        return z.reshape(*z.shape[:-2], -1)
    return _three_step_merged(h * rdp[0], p.ul, p.us, p.ur)


def singular_layer_apply(
    p: SingularLayerParams,
    x_seq: jax.Array,
    h0: jax.Array | None = None,
    c0: jax.Array | None = None,
    return_state: bool = False,
    dropout: float = 0.0,
    recurrent_dropout: float = 0.0,
    rng: jax.Array | None = None,
    remat_chunk: int = 0,
):
    """``remat_chunk > 0``: chunked-time ``jax.checkpoint`` BPTT, exactly
    like the dense layer (models/lstm.py) — the backward pass recomputes
    each chunk's three-step input projection and gate intermediates from
    the raw input chunk, so long fine-tune windows fit in HBM."""
    B, T, d = x_seq.shape
    n = p.units
    dtype = x_seq.dtype
    if h0 is None:
        h0 = zeros_varying_like(x_seq, (B, n), dtype)
    if c0 is None:
        c0 = zeros_varying_like(x_seq, (B, n), dtype)

    use_dp = dropout > 0.0
    use_rdp = recurrent_dropout > 0.0
    if (use_dp or use_rdp) and rng is None:
        raise ValueError("dropout requires an rng key")
    if use_dp or use_rdp:
        k_dp, k_rdp = jax.random.split(rng)

    if use_dp:
        dp = dropout_masks(k_dp, dropout, (B, d), 4 if p.split else 1, dtype)

    def make_xp(x_tbd):
        """Input three-step product for (T', B, d) time-major input.
        The unmasked einsums are leading-dim-agnostic; the masked split
        path is the time-major transpose of _masked_input_projection."""
        if not use_dp:
            return singular_input_projection(p, x_tbd)
        if p.split:
            xm = x_tbd[:, :, None, :] * jnp.transpose(dp, (1, 0, 2))[None]
            xg = jnp.einsum("tbgd,gdk->tbgk", xm, p.wl) * p.ws
            xp = jnp.einsum("tbgk,gkn->tbgn", xg, p.wr)
            return xp.reshape(*xp.shape[:-2], -1) + p.b
        return _three_step_merged(x_tbd * dp[0][None], p.wl, p.ws, p.wr) + p.b

    if use_rdp:
        rdp = dropout_masks(k_rdp, recurrent_dropout, (B, n), 4 if p.split else 1, dtype)

    def step(carry, xp_step):
        h, c = carry
        if use_rdp:
            z = xp_step + _masked_recurrent_product(p, h, rdp)
        else:
            z = xp_step + singular_recurrent_product(p, h)
        h, c = gate_update(z, c)
        return (h, c), h

    x_t = jnp.swapaxes(x_seq, 0, 1)  # (T, B, d)

    if remat_chunk and 0 < remat_chunk < T:
        (hT, cT), h_seq = chunked_remat_scan(
            step, make_xp, x_t, (h0, c0), int(remat_chunk)
        )
    else:
        (hT, cT), h_seq = jax.lax.scan(step, (h0, c0), make_xp(x_t))
    h_seq = jnp.swapaxes(h_seq, 0, 1)
    if return_state:
        return h_seq, (hT, cT)
    return h_seq


def singular_lstm_apply(
    params: SingularModelParams,
    x_seq: jax.Array,
    return_sequences: bool = True,
    dropout: float = 0.0,
    recurrent_dropout: float = 0.0,
    rng: jax.Array | None = None,
    remat_chunk: int = 0,
) -> jax.Array:
    use_drop = dropout > 0.0 or recurrent_dropout > 0.0
    if use_drop and rng is None:
        raise ValueError("dropout requires an rng key")
    keys = jax.random.split(rng, len(params.layers)) if use_drop else [None] * len(params.layers)
    h = x_seq
    for layer, k in zip(params.layers, keys):
        h = singular_layer_apply(
            layer, h, dropout=dropout, recurrent_dropout=recurrent_dropout, rng=k,
            remat_chunk=remat_chunk,
        )
    if not return_sequences:
        h = h[:, -1]
    return h @ params.head.w + params.head.b
