"""Property-based tests (hypothesis) for the factorization algebra."""

import numpy as np
import pytest

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import given, settings, strategies as st_h

from svd_lstm_tpu.factor.svd import reduce_matrix_rank, two_step_factors


@settings(max_examples=25, deadline=None)
@given(
    m=st_h.integers(2, 24),
    n=st_h.integers(2, 24),
    seed=st_h.integers(0, 2**31 - 1),
)
def test_two_step_reconstructs_rank_truncation(m, n, seed):
    """x @ [B | BC] must equal x @ A_r (the rank-r best approximation)."""
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(m, n))
    r = max(1, min(m, n) // 2)
    B, C = two_step_factors(A, r)
    Ar = reduce_matrix_rank(A, r)
    x = rng.normal(size=(3, m))
    z = np.concatenate([x @ B, (x @ B) @ C], axis=1)
    np.testing.assert_allclose(z, x @ Ar, atol=1e-8)


@settings(max_examples=25, deadline=None)
@given(
    m=st_h.integers(2, 24),
    n=st_h.integers(2, 24),
    seed=st_h.integers(0, 2**31 - 1),
)
def test_rank_reduction_monotone_error(m, n, seed):
    """Frobenius error is non-increasing in the kept rank."""
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(m, n))
    errs = [
        np.linalg.norm(A - reduce_matrix_rank(A, r), "fro")
        for r in range(1, min(m, n) + 1)
    ]
    assert all(a >= b - 1e-9 for a, b in zip(errs, errs[1:]))
    assert errs[-1] < 1e-9  # full rank reconstructs exactly


@settings(max_examples=15, deadline=None)
@given(seed=st_h.integers(0, 2**31 - 1), r=st_h.integers(1, 10))
def test_two_step_weight_count(seed, r):
    """slide-9 accounting: B and C store r(m + n − r) weights."""
    rng = np.random.default_rng(seed)
    m, n = 12, 20
    B, C = two_step_factors(rng.normal(size=(m, n)), r)
    assert B.size + C.size == r * (m + n - r)


@settings(max_examples=10, deadline=None)
@given(
    d=st_h.integers(2, 12),
    units=st_h.lists(st_h.integers(3, 14), min_size=1, max_size=3),
    merged=st_h.booleans(),
    seed=st_h.integers(0, 2**31 - 1),
)
def test_surgery_roundtrip_exact_random_shapes(d, units, merged, seed):
    """dense -> singular -> dense is exact for ANY layer geometry (the
    reference's factorization identity, code/svd_classes_v3.py:469-598)."""
    import jax

    from svd_lstm_tpu.factor.svd import make_singular_model, singular_to_dense
    from svd_lstm_tpu.models.lstm import init_stacked_lstm

    dense = init_stacked_lstm(jax.random.PRNGKey(seed % 2**31), d, tuple(units))
    back = singular_to_dense(make_singular_model(dense, merged_kernel=merged))
    for a, b in zip(jax.tree.leaves(dense), jax.tree.leaves(back)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


@settings(max_examples=10, deadline=None)
@given(
    d=st_h.integers(2, 10),
    n=st_h.integers(3, 12),
    merged=st_h.booleans(),
    seed=st_h.integers(0, 2**31 - 1),
)
def test_full_rank_reduced_forward_exact_random_shapes(d, n, merged, seed):
    """Truncation at full rank must reproduce the dense forward exactly
    for any geometry (exact two-step identity, slide 6-9)."""
    import jax
    import jax.numpy as jnp

    from svd_lstm_tpu.factor.svd import make_reduced_model, make_singular_model
    from svd_lstm_tpu.models.lstm import init_stacked_lstm, stacked_lstm_apply
    from svd_lstm_tpu.models.reduced import reduced_lstm_apply

    dense = init_stacked_lstm(jax.random.PRNGKey(seed % 2**31), d, (n,))
    red = make_reduced_model(
        make_singular_model(dense, merged_kernel=merged), rank=4 * n if merged else n
    )
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(2, 6, d)).astype(np.float32))
    y_d = np.asarray(stacked_lstm_apply(dense, x))
    y_r = np.asarray(reduced_lstm_apply(red, x))
    np.testing.assert_allclose(y_r, y_d, atol=2e-4)


@settings(max_examples=20, deadline=None)
@given(
    rows=st_h.integers(1, 20),
    cols=st_h.integers(1, 20),
    seed=st_h.integers(0, 2**31 - 1),
)
def test_int8_quantization_error_bound(rows, cols, seed):
    """|w - q*scale| <= scale/2 elementwise (utils/quantize.py contract)."""
    from svd_lstm_tpu.utils.quantize import dequantize_tensor, quantize_tensor

    rng = np.random.default_rng(seed)
    w = (rng.normal(size=(rows, cols)) * 10 ** rng.uniform(-3, 3)).astype(np.float32)
    t = quantize_tensor(w)
    err = np.abs(np.asarray(dequantize_tensor(t)) - w)
    bound = np.asarray(t.scale) / 2 + 1e-12
    assert (err <= bound).all()


@settings(max_examples=20, deadline=None)
@given(
    m=st_h.integers(2, 16),
    n=st_h.integers(2, 16),
    seed=st_h.integers(0, 2**31 - 1),
)
def test_fold_ic_identity(m, n, seed):
    """(x@B) @ [I|C] == concat(x@B, (x@B)@C) — the kernels' folded form."""
    import jax.numpy as jnp

    from svd_lstm_tpu.factor.svd import two_step_factors
    from svd_lstm_tpu.utils.linalg import fold_IC

    rng = np.random.default_rng(seed)
    A = rng.normal(size=(m, n))
    r = max(1, min(m, n) - 1)
    B, C = two_step_factors(A, r)
    # fold_IC is a jnp helper: compare in f32 (jnp downcasts f64 inputs)
    B32, C32 = B.astype(np.float32), C.astype(np.float32)
    x = rng.normal(size=(3, m)).astype(np.float32)
    xb = x @ B32
    folded = xb @ np.asarray(fold_IC(jnp.asarray(B32), jnp.asarray(C32)))
    # one fused matmul vs two: f32 accumulation order differs, and the
    # error scales with the OPERAND magnitudes (cancellation), not the
    # output element — including |C|, which an ill-conditioned V₁
    # inversion can blow up to O(1e3) (hypothesis found m=13,n=4,seed=1
    # with max|C|≈2163). A real fold bug is O(|xb·C|).
    scale = (float(np.abs(xb).max()) + 1.0) * (float(np.abs(C32).max()) + 1.0)
    np.testing.assert_allclose(
        folded, np.concatenate([xb, xb @ C32], axis=1),
        atol=1e-5 * scale, rtol=1e-5,
    )
