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
