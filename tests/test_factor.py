"""Factorization correctness: singular == dense, reduced == dense (no
truncation), two-step exactness, Eckart–Young, regularizer values."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from svd_lstm_tpu.factor.regularizers import hoyer_penalty, orthogonal_penalty
from svd_lstm_tpu.factor.svd import (
    get_model_singular_values,
    make_reduced_model,
    make_singular_model,
    reduce_matrix_rank,
    reduce_two_step,
    set_model_matrix_rank,
    two_step_factors,
)
from svd_lstm_tpu.models.lstm import init_stacked_lstm, stacked_lstm_apply
from svd_lstm_tpu.models.reduced import reduced_lstm_apply
from svd_lstm_tpu.models.singular import singular_lstm_apply


@pytest.fixture(scope="module")
def dense_model():
    return init_stacked_lstm(jax.random.PRNGKey(42), input_dim=16, units=(20, 20))


@pytest.fixture(scope="module")
def x_seq():
    rng = np.random.default_rng(7)
    return jnp.asarray(rng.normal(size=(2, 40, 16)), jnp.float32)


class TestSingularReconstruction:
    @pytest.mark.parametrize("merged", [True, False])
    def test_singular_equals_dense(self, dense_model, x_seq, merged):
        """SVD factorization is exact ⇒ singular forward == dense forward."""
        smodel = make_singular_model(dense_model, merged_kernel=merged)
        y_dense = np.asarray(stacked_lstm_apply(dense_model, x_seq))
        y_sing = np.asarray(singular_lstm_apply(smodel, x_seq))
        np.testing.assert_allclose(y_sing, y_dense, atol=5e-5)

    @pytest.mark.parametrize("merged", [True, False])
    def test_reduced_no_truncation_equals_dense(self, dense_model, x_seq, merged):
        """cutoff below every σ ⇒ two-step reconstruction is exact."""
        smodel = make_singular_model(dense_model, merged_kernel=merged)
        rmodel = make_reduced_model(smodel, cutoff=0.0)
        y_dense = np.asarray(stacked_lstm_apply(dense_model, x_seq))
        y_red = np.asarray(reduced_lstm_apply(rmodel, x_seq))
        np.testing.assert_allclose(y_red, y_dense, atol=5e-4)

    def test_mild_truncation_close(self, dense_model, x_seq):
        smodel = make_singular_model(dense_model, merged_kernel=False)
        rmodel = make_reduced_model(smodel, cutoff=0.05)
        y_dense = np.asarray(stacked_lstm_apply(dense_model, x_seq))
        y_red = np.asarray(reduced_lstm_apply(rmodel, x_seq))
        # random orthogonal-init recurrent kernels have σ ≈ 1 ≫ 0.05, so only
        # the glorot input kernels lose tiny components
        assert np.abs(y_red - y_dense).max() < 0.1

    def test_weight_count_drops_with_rank(self, dense_model):
        smodel = make_singular_model(dense_model, merged_kernel=False)
        full = make_reduced_model(smodel, cutoff=0.0)
        r5 = make_reduced_model(smodel, rank=5)
        assert r5.layers[0].weight_count() < full.layers[0].weight_count()

    def test_slide9_weight_formula(self):
        """Reduced two-step gate of shape m×n at rank r stores
        r·m + r·(n−r) weights (slide 9)."""
        rng = np.random.default_rng(0)
        m, n, r = 30, 30, 20
        B, C = two_step_factors(rng.normal(size=(m, n)), r)
        assert B.size + C.size == r * m + r * (n - r)


class TestTwoStep:
    def test_exact_when_low_rank(self, rng):
        m, n, r = 12, 20, 5
        A = rng.normal(size=(m, r)) @ rng.normal(size=(r, n))
        B, C = two_step_factors(A, r)
        x = rng.normal(size=(3, m))
        z = np.concatenate([x @ B, (x @ B) @ C], axis=1)
        np.testing.assert_allclose(z, x @ A, atol=1e-9)

    def test_row_convention_parity(self, rng):
        """v1-API reduce_two_step: W@x two-step (reference
        old_versions/svd_classes.py:69-101 usage pattern)."""
        n, r = 15, 6
        W = rng.normal(size=(n, r)) @ rng.normal(size=(r, n))
        D, E = reduce_two_step(W, r)
        x = rng.normal(size=(n, 1))
        top = D @ x
        full = np.concatenate([top, E @ top], axis=0)
        np.testing.assert_allclose(full, W @ x, atol=1e-9)

    def test_eckart_young(self, rng):
        """‖A − A_r‖_F² = Σ_{i>r} σ_i² (slide 5)."""
        A = rng.normal(size=(20, 30))
        s = np.linalg.svd(A, compute_uv=False)
        for r in [1, 5, 15]:
            Ar = reduce_matrix_rank(A, r)
            err = np.linalg.norm(A - Ar, "fro") ** 2
            np.testing.assert_allclose(err, np.sum(s[r:] ** 2), rtol=1e-9)

    def test_eckart_young_bound_is_minimal(self, rng):
        """Eckart–Young as a BOUND (SURVEY §4c): the SVD truncation is the
        best rank-r approximation — no other rank-r matrix gets closer in
        Frobenius norm."""
        A = rng.normal(size=(20, 30))
        for r in [2, 8]:
            Ar = reduce_matrix_rank(A, r)
            best = np.linalg.norm(A - Ar, "fro")
            for trial in range(25):
                t = np.random.default_rng(100 * r + trial)
                B = t.normal(size=(20, r)) @ t.normal(size=(r, 30))
                # scale the competitor optimally toward A (least squares in
                # the 1-d span {cB}) so the comparison isn't a strawman
                c = np.vdot(B, A) / max(np.vdot(B, B), 1e-12)
                assert np.linalg.norm(A - c * B, "fro") >= best - 1e-9


class TestRankUtilities:
    def test_get_singular_values_shape(self, dense_model):
        sv = get_model_singular_values(dense_model)
        assert sv.shape == (2, 2, 4, 20)
        assert (sv >= 0).all()
        # W blocks of layer 0 are 16×20 → only 16 nonzero σ
        assert np.allclose(sv[0, 0, :, 16:], 0.0)

    def test_set_model_matrix_rank(self, dense_model, x_seq):
        out = set_model_matrix_rank(dense_model, (1, 1, 2), rank=3)
        n = 20
        blk = np.asarray(out.layers[1].U)[:, 2 * n : 3 * n]
        assert np.linalg.matrix_rank(blk, tol=1e-4) == 3
        # other blocks untouched
        np.testing.assert_array_equal(
            np.asarray(out.layers[1].U)[:, :n], np.asarray(dense_model.layers[1].U)[:, :n]
        )
        # model still runs
        y = stacked_lstm_apply(out, x_seq)
        assert np.isfinite(np.asarray(y)).all()


class TestRegularizers:
    def test_hoyer_value(self):
        x = jnp.asarray([1.0, -2.0, 3.0])
        expected = 0.01 * 6.0 / 14.0
        assert float(hoyer_penalty(x, 0.01)) == pytest.approx(expected, rel=1e-6)

    def test_hoyer_scale_invariant(self):
        x = jnp.asarray([1.0, 2.0, 0.5, 4.0])
        a = float(hoyer_penalty(x, 1.0))
        b = float(hoyer_penalty(10.0 * x, 1.0))
        assert b == pytest.approx(a / 10.0, rel=1e-5)

    def test_hoyer_safe_at_zero(self):
        assert np.isfinite(float(hoyer_penalty(jnp.zeros(5), 1.0)))

    def test_trace_norm_is_nuclear_norm_of_factorized_matrix(self, rng):
        """L1 on σ == ‖W‖* (sum of singular values) for an orthogonal-factor
        SVD parameterization — the convex rank surrogate (arxiv 1710.09026)."""
        from svd_lstm_tpu.factor.regularizers import trace_norm_penalty

        w = rng.normal(size=(12, 20)).astype(np.float32)
        sigma = np.linalg.svd(w, compute_uv=False)
        got = float(trace_norm_penalty(jnp.asarray(sigma), coef=0.3))
        assert got == pytest.approx(0.3 * sigma.sum(), rel=1e-5)

    def test_trace_norm_in_regularization_loss_and_shrinks_sigma(self):
        """FactorConfig.trace_norm reaches the fine-tune loss, and a short
        fine-tune under it shrinks mean |σ| relative to the unregularized
        run (constant shrink pressure, unlike the scale-invariant Hoyer)."""
        from svd_lstm_tpu.config import FactorConfig, TrainConfig
        from svd_lstm_tpu.factor.svd import make_singular_model
        from svd_lstm_tpu.models.lstm import init_stacked_lstm
        from svd_lstm_tpu.train.finetune import finetune, regularization_loss

        dense = init_stacked_lstm(jax.random.PRNGKey(0), input_dim=6, units=(8,))
        sp = make_singular_model(dense)
        base = float(regularization_loss(sp, FactorConfig(hoyer=0.0)))
        with_tn = float(
            regularization_loss(sp, FactorConfig(hoyer=0.0, trace_norm=0.5))
        )
        expected = 0.5 * sum(
            float(jnp.sum(jnp.abs(l.ws)) + jnp.sum(jnp.abs(l.us)))
            for l in sp.layers
        )
        assert with_tn - base == pytest.approx(expected, rel=1e-5)

        rng_np = np.random.default_rng(0)
        X = rng_np.normal(size=(1, 200, 6)).astype(np.float32)
        y = rng_np.normal(size=(200,)).astype(np.float32)
        kw = dict(num_windows=8, window_len=25, batch_size=4, epochs=3)

        def mean_abs_sigma(p):
            return float(
                np.mean([np.abs(np.asarray(l.ws)).mean() for l in p.layers]
                        + [np.abs(np.asarray(l.us)).mean() for l in p.layers])
            )

        r0 = finetune(sp, X, y, FactorConfig(hoyer=0.0), TrainConfig(**kw))
        r1 = finetune(sp, X, y, FactorConfig(hoyer=0.0, trace_norm=0.1),
                      TrainConfig(**kw))
        assert mean_abs_sigma(r1.params) < mean_abs_sigma(r0.params)

    def test_orthogonal_zero_for_orthogonal(self):
        q, _ = np.linalg.qr(np.random.default_rng(0).normal(size=(10, 10)))
        val = float(orthogonal_penalty(jnp.asarray(q, jnp.float32), factor=1.0))
        assert val < 1e-5

    def test_orthogonal_positive_for_correlated(self):
        m = jnp.ones((4, 6))
        assert float(orthogonal_penalty(m, factor=1.0)) > 0.4

    def test_orthogonal_matches_keras_formula(self, rng):
        m = rng.normal(size=(5, 8))
        mn = m / np.linalg.norm(m, axis=1, keepdims=True)
        gram = mn @ mn.T
        off = np.abs(gram - np.diag(np.diag(gram))).sum()
        expected = 0.5 * off / (5 * 4 / 2.0)
        got = float(orthogonal_penalty(jnp.asarray(m, jnp.float32), factor=1.0))
        assert got == pytest.approx(expected, rel=1e-4)


def test_rank_truncation_keeps_top_r_by_magnitude(rng):
    """After a fine-tune reorders σ, rank= truncation must keep the top-r
    by magnitude, not the first r slots (round-3 review finding)."""
    from svd_lstm_tpu.factor.svd import _truncate_factors

    d = 6
    q, _ = np.linalg.qr(rng.normal(size=(d, d)))
    q2, _ = np.linalg.qr(rng.normal(size=(d, d)))
    sigma = np.array([0.1, 3.0, 0.2, 2.0, 0.05, 1.0])  # NOT descending
    B, C = _truncate_factors(q, sigma, q2.T, cutoff=None, rank=3)
    # reconstruction must equal keeping exactly the {3.0, 2.0, 1.0} components
    keep = np.zeros(d, bool)
    keep[[1, 3, 5]] = True
    W_expect = (q[:, keep] * sigma[keep]) @ q2.T[keep, :]
    got = np.concatenate([B, B @ C], axis=1)
    np.testing.assert_allclose(got, W_expect, atol=1e-10)


def test_truncate_requires_a_selection_rule():
    from svd_lstm_tpu.factor.svd import _truncate_factors

    with pytest.raises(ValueError, match="selection rule"):
        _truncate_factors(np.eye(3), np.ones(3), np.eye(3), cutoff=None, rank=None)


def test_singular_values_non_uniform_stack():
    """get_model_singular_values must handle widening stacks (round-3
    review finding: output was sized from layer 0's units)."""
    from svd_lstm_tpu.factor.svd import get_model_singular_values
    from svd_lstm_tpu.models.lstm import init_stacked_lstm

    params = init_stacked_lstm(jax.random.PRNGKey(0), input_dim=5, units=(6, 12))
    sv = get_model_singular_values(params)
    assert sv.shape == (2, 2, 4, 12)
    assert (sv[1, 1, :, :12] > 0).all()      # layer 1 U: full 12 σ present
    assert (sv[0, 0, :, 5:] == 0).all()      # layer 0 W: only min(5,6)=5 σ


def test_rank_truncation_tie_stability():
    """Degenerate all-equal σ (orthogonal-initialized recurrent kernels):
    the top-r rule must reduce to the first-r rule so tied subsets don't
    silently change the truncated basis (round-3 regression)."""
    from svd_lstm_tpu.factor.svd import _truncate_factors

    d = 6
    q = np.linalg.qr(np.random.default_rng(1).normal(size=(d, d)))[0]
    q2 = np.linalg.qr(np.random.default_rng(2).normal(size=(d, d)))[0]
    sigma = np.full(d, 2.0)
    B_new, C_new = _truncate_factors(q, sigma, q2.T, cutoff=None, rank=4)
    # first-r reference
    U, S, V = q[:, :4], sigma[:4], q2.T[:4, :]
    B_ref = (U * S) @ V[:, :4]
    C_ref = np.linalg.solve(V[:, :4], V[:, 4:])
    np.testing.assert_allclose(B_new, B_ref, atol=1e-12)
    np.testing.assert_allclose(C_new, C_ref, atol=1e-12)


def test_orthogonal_penalty_single_row_is_zero_not_nan():
    """round-3 review: a (1, k) factor (d=1 inputs) has no off-diagonal
    pairs — the penalty must be 0, not 0/0 = NaN poisoning the loss."""
    v = orthogonal_penalty(jnp.ones((1, 8)), factor=0.5)
    assert float(v) == 0.0 and np.isfinite(float(v))


def test_orthogonal_penalty_split_matches_concatenated():
    """Split (4, a, b) factors penalize as the column-concatenated (a, 4b)
    matrix — the reference's storage layout (round-3 review)."""
    rng = np.random.default_rng(3)
    m3 = jnp.asarray(rng.normal(size=(4, 5, 6)), jnp.float32)
    concat = jnp.concatenate([m3[g] for g in range(4)], axis=1)
    np.testing.assert_allclose(
        float(orthogonal_penalty(m3)), float(orthogonal_penalty(concat)), rtol=1e-6
    )


def test_forward_fill_nan_leading_values():
    from svd_lstm_tpu.data.dropbear import forward_fill_nan

    out = forward_fill_nan(np.array([np.nan, np.nan, 2.0, np.nan, 5.0]))
    np.testing.assert_allclose(out, [2.0, 2.0, 2.0, 2.0, 5.0])
    with pytest.raises(ValueError, match="all-NaN"):
        forward_fill_nan(np.array([np.nan, np.nan]))


@pytest.mark.parametrize("merged", [True, False])
def test_input_dim_uniform_across_families(dense_model, merged):
    """Every model family exposes layers[i].input_dim (the CLI trace path
    builds inputs for an arbitrary checkpoint through it)."""
    smodel = make_singular_model(dense_model, merged_kernel=merged)
    rmodel = make_reduced_model(smodel, rank=12)
    for model in (dense_model, smodel, rmodel):
        assert model.layers[0].input_dim == 16
        assert model.layers[1].input_dim == model.layers[0].units == 20


def test_cutoff_truncation_keeps_negative_sigma_by_magnitude(dense_model):
    """A fine-tuned sigma pushed through zero must survive a cutoff by
    |sigma| — the reference's signed compare (code/svd_classes_v3.py:619)
    would drop a -0.8 'below' a 0.05 cutoff, a reconstruction error far
    above the cutoff contract."""
    smodel = make_singular_model(dense_model, merged_kernel=False)
    l0 = smodel.layers[0]
    ws = np.asarray(l0.ws).copy()
    kept_mag = abs(ws[0, 0])
    ws[0, 0] = -ws[0, 0]  # gate i's largest sigma goes negative
    flipped = smodel._replace(
        layers=(l0._replace(ws=jnp.asarray(ws)),) + smodel.layers[1:]
    )
    rmodel = make_reduced_model(flipped, cutoff=0.05)
    # exactness: the two-step with the negative sigma kept reconstructs
    # the flipped dense W exactly (same identity as the positive case)
    Bg, Cg = np.asarray(rmodel.layers[0].wB[0]), np.asarray(rmodel.layers[0].wC[0])
    W_flip = (np.asarray(l0.wl[0]) * ws[0]) @ np.asarray(l0.wr[0])
    r = Bg.shape[1]
    np.testing.assert_allclose(
        np.concatenate([Bg, Bg @ Cg], axis=1), W_flip, atol=1e-5
    )
    assert kept_mag > 0.05 and r >= int((np.abs(ws[0]) > 0.05).sum())
