"""Int8 weight quantization (utils/quantize.py) — a compression axis beyond
the reference's rank truncation; must bound elementwise error, preserve
pytree structure, compose with reduced models, and checkpoint."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import svd_lstm_tpu as st
from svd_lstm_tpu.models.lstm import init_stacked_lstm, stacked_lstm_apply
from svd_lstm_tpu.models.reduced import reduced_lstm_apply
from svd_lstm_tpu.utils.quantize import (
    QuantizedTensor,
    dequantize_params,
    dequantize_tensor,
    param_bytes,
    quantize_params,
    quantize_tensor,
    quantized_apply,
)


def test_elementwise_bound(rng):
    w = jnp.asarray(rng.normal(size=(37, 64)), jnp.float32)
    t = quantize_tensor(w)
    assert t.q.dtype == jnp.int8
    err = np.abs(np.asarray(dequantize_tensor(t)) - np.asarray(w))
    bound = np.asarray(t.scale / 2) + 1e-7
    assert (err <= bound).all()


def test_zero_column_is_exact():
    w = jnp.zeros((8, 4), jnp.float32)
    t = quantize_tensor(w)
    np.testing.assert_array_equal(np.asarray(dequantize_tensor(t)), np.asarray(w))


def test_structure_and_selectivity():
    params = init_stacked_lstm(jax.random.PRNGKey(0), input_dim=16, units=(32, 32))
    q = quantize_params(params)
    assert type(q) is type(params)
    # matrices quantized, 1-D biases untouched
    assert isinstance(q.layers[0].W, QuantizedTensor)
    assert isinstance(q.layers[0].U, QuantizedTensor)
    assert q.layers[0].b.dtype == jnp.float32
    assert isinstance(q.head.w, QuantizedTensor)
    back = dequantize_params(q)
    assert type(back) is type(params)
    assert back.layers[0].W.shape == params.layers[0].W.shape
    # ~4x smaller storage for the matrix-dominated pytree
    assert param_bytes(q) < 0.35 * param_bytes(params)


def _quantized_close(apply_fn, params, x, tol):
    ref = np.asarray(apply_fn(params, x))
    out = np.asarray(jax.jit(quantized_apply(apply_fn))(quantize_params(params), x))
    scale = max(np.abs(ref).max(), 1e-6)
    assert np.abs(out - ref).max() / scale < tol


def test_quantized_dense_forward(rng):
    params = init_stacked_lstm(jax.random.PRNGKey(1), input_dim=8, units=(16, 16))
    x = jnp.asarray(rng.normal(size=(2, 50, 8)), jnp.float32)
    _quantized_close(stacked_lstm_apply, params, x, tol=0.05)


def test_quantized_reduced_forward_split_and_merged(rng):
    params = init_stacked_lstm(jax.random.PRNGKey(2), input_dim=8, units=(12, 12))
    x = jnp.asarray(rng.normal(size=(1, 40, 8)), jnp.float32)
    for merged in (False, True):
        s = st.make_singular_model(params, merged_kernel=merged)
        r = st.make_reduced_model(s, rank=8)
        _quantized_close(reduced_lstm_apply, r, x, tol=0.05)


def test_quantized_checkpoint_roundtrip(tmp_path):
    from svd_lstm_tpu.io.checkpoint import load_params, save_params

    params = init_stacked_lstm(jax.random.PRNGKey(3), input_dim=5, units=(4,))
    q = quantize_params(params)
    path = str(tmp_path / "q.npz")
    save_params(path, q)
    back = load_params(path)
    assert isinstance(back.layers[0].W, QuantizedTensor)
    assert back.layers[0].W.q.dtype == jnp.int8
    for a, b in zip(jax.tree.leaves(q), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_quantize_params_idempotent():
    params = init_stacked_lstm(jax.random.PRNGKey(4), input_dim=5, units=(4,))
    q = quantize_params(params)
    qq = quantize_params(q)  # must be a no-op, not nested quantization
    assert isinstance(qq.layers[0].W, QuantizedTensor)
    assert not isinstance(qq.layers[0].W.scale, QuantizedTensor)
    for a, b in zip(jax.tree.leaves(q), jax.tree.leaves(qq)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_dequantized_params_merged_reduced(rng):
    """dequantized_params on a merged reduced model keeps the single-array
    structure and quantizes per OUTPUT column of each factor (the ADVICE-r2
    per-row bug is structurally impossible now that the side helper treats
    merged as a one-group side — round 3)."""
    from svd_lstm_tpu.io.int8_export import dequantized_params

    params = init_stacked_lstm(jax.random.PRNGKey(7), input_dim=8, units=(12,))
    s = st.make_singular_model(params, merged_kernel=True)
    r = st.make_reduced_model(s, rank=8)
    dq = dequantized_params(r)
    l, lq = r.layers[0], dq.layers[0]
    assert not lq.split
    for a, b in ((l.wB, lq.wB), (l.uB, lq.uB), (l.wC, lq.wC), (l.uC, lq.uC)):
        assert np.asarray(b).shape == np.asarray(a).shape
    # B encodes plainly: per-output-column grid, error <= scale/2
    for a, b in ((l.wB, lq.wB), (l.uB, lq.uB)):
        a, b = np.asarray(a), np.asarray(b)
        bound = np.abs(a).max(axis=0) / 127.0 / 2 + 1e-6
        assert (np.abs(b - a).max(axis=0) <= bound).all()
    # the encoded layer reconstructs the two-step product to grid accuracy
    # (C may be the compensated re-solve, so compare products, not C itself)
    prod = np.asarray(l.uB) @ np.asarray(l.uC)
    prod_q = np.asarray(lq.uB) @ np.asarray(lq.uC)
    assert np.abs(prod_q - prod).max() < 0.05 * max(np.abs(prod).max(), 1.0)
    np.testing.assert_array_equal(np.asarray(lq.b), np.asarray(l.b))


@pytest.mark.parametrize("merged", [True, False])
def test_quantize_never_touches_sigma(merged):
    """sigma precision is what the Hoyer fine-tune trains; split-mode sigma
    stacks to (4, n) — 2-D — and must STILL stay f32 (the ndim rule alone
    quantized it)."""
    import svd_lstm_tpu as st
    from svd_lstm_tpu.models.lstm import init_stacked_lstm
    from svd_lstm_tpu.utils.quantize import QuantizedTensor, quantize_params

    dense = init_stacked_lstm(jax.random.PRNGKey(4), input_dim=5, units=(8, 7))
    smodel = st.make_singular_model(dense, merged_kernel=merged)
    q = quantize_params(smodel)
    for l, ql in zip(smodel.layers, q.layers):
        assert not isinstance(ql.ws, QuantizedTensor)
        assert not isinstance(ql.us, QuantizedTensor)
        np.testing.assert_array_equal(np.asarray(ql.ws), np.asarray(l.ws))
        np.testing.assert_array_equal(np.asarray(ql.us), np.asarray(l.us))
        # the factor matrices DO quantize
        assert isinstance(ql.wl, QuantizedTensor)
        assert isinstance(ql.ur, QuantizedTensor)
    assert isinstance(q.head.w, QuantizedTensor)


def test_int8_compensation_never_increases_encoded_error():
    """The exporter's C-factor compensation (io/int8_export.py module
    docstring) keeps whichever encoding reconstructs the second block
    better, so it can never lose; on a C with V1^-1-style row outliers it
    must strictly win."""
    from svd_lstm_tpu.factor.svd import make_reduced_model, make_singular_model
    from svd_lstm_tpu.io.int8_export import _compensated_gate_pairs, _dq

    dense = init_stacked_lstm(jax.random.PRNGKey(3), input_dim=6, units=(12, 12))
    red = make_reduced_model(make_singular_model(dense, merged_kernel=False), rank=8)
    for l in red.layers:
        for Bs, Cs in ((l.wB, l.wC), (l.uB, l.uC)):
            plain = _compensated_gate_pairs(Bs, Cs, False)
            comp = _compensated_gate_pairs(Bs, Cs, True)
            for (B0, C0), (B1, C1) in zip(plain, comp):
                np.testing.assert_array_equal(B0, B1)  # B never changes
                target = B0 @ C0  # plain passes C through, so this is B @ C
                e_plain = np.linalg.norm(_dq(B0) @ _dq(C0) - target)
                e_comp = np.linalg.norm(_dq(B1) @ _dq(C1) - target)
                assert e_comp <= e_plain + 1e-6

    # On a TRAINED model the mechanism engages for real: fine-tuned factors
    # develop ill-conditioned V1 blocks whose C = V1^-1 V2 carries large
    # rows (measured max|C| up to ~250 on this checkpoint), and the
    # re-solve strictly shrinks the encoded error (BENCH_NOTES §int8
    # artifact compensation). Random-init models stay near-orthogonal and
    # barely engage it, so the strict-win assert needs the shipped
    # checkpoint.
    from svd_lstm_tpu.io.checkpoint import load_params

    trained = load_params("model_saves/pretrained_sequential.npz")
    red16 = make_reduced_model(
        make_singular_model(trained, merged_kernel=False), rank=16
    )
    tot_plain = tot_comp = 0.0
    for l in red16.layers:
        for Bs, Cs in ((l.wB, l.wC), (l.uB, l.uC)):
            plain = _compensated_gate_pairs(Bs, Cs, False)
            comp = _compensated_gate_pairs(Bs, Cs, True)
            for (B0, C0), (B1, C1) in zip(plain, comp):
                target = B0 @ C0
                tot_plain += float(np.linalg.norm(_dq(B0) @ _dq(C0) - target) ** 2)
                tot_comp += float(np.linalg.norm(_dq(B1) @ _dq(C1) - target) ** 2)
    assert tot_comp < 0.8 * tot_plain  # measured 0.72 on this checkpoint


def test_int8_bin_compensate_flag(tmp_path):
    """compensate=False preserves the raw per-matrix quantization (the
    round-2 artifact), and the flag changes the written bytes when C has
    range worth compensating; the oracle follows the same flag."""
    from svd_lstm_tpu.factor.svd import make_reduced_model, make_singular_model
    from svd_lstm_tpu.io.int8_export import (
        _dq,
        dequantized_params,
        save_model_int8_bin,
    )

    dense = init_stacked_lstm(jax.random.PRNGKey(4), input_dim=6, units=(10, 10))
    red = make_reduced_model(make_singular_model(dense, merged_kernel=False), rank=6)

    raw = dequantized_params(red, compensate=False)
    for l_raw, l in zip(raw.layers, red.layers):
        for C_raw, C in zip(l_raw.wC + l_raw.uC, l.wC + l.uC):
            if np.asarray(C).size:
                np.testing.assert_array_equal(C_raw, _dq(np.asarray(C, np.float32)))

    p0 = str(tmp_path / "plain.bin")
    p1 = str(tmp_path / "comp.bin")
    save_model_int8_bin(red, p0, compensate=False)
    save_model_int8_bin(red, p1, compensate=True)
    b0, b1 = open(p0, "rb").read(), open(p1, "rb").read()
    assert len(b0) == len(b1)  # same format, same shapes


def test_quantize_params_reduced_matches_exporter_oracle():
    """The device-side int8 path (utils/quantize.quantize_params) applies
    the SAME C-factor compensation as the binary exporter, so the npz and
    .bin artifacts encode the same f32 model (modulo the head, which the
    .bin keeps exact)."""
    from svd_lstm_tpu.factor.svd import make_reduced_model, make_singular_model
    from svd_lstm_tpu.io.int8_export import dequantized_params as oracle

    dense = init_stacked_lstm(jax.random.PRNGKey(5), input_dim=6, units=(10, 10))
    red = make_reduced_model(make_singular_model(dense, merged_kernel=False), rank=6)

    dq_npz = dequantize_params(quantize_params(red))
    dq_bin = oracle(red, compensate=True)
    for l_npz, l_bin in zip(dq_npz.layers, dq_bin.layers):
        for a, b in zip(
            l_npz.wB + l_npz.wC + l_npz.uB + l_npz.uC,
            l_bin.wB + l_bin.wC + l_bin.uB + l_bin.uC,
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)
    # idempotent, like the other families
    q = quantize_params(red)
    q2 = quantize_params(q)
    assert jax.tree_util.tree_structure(q) == jax.tree_util.tree_structure(q2)

    # merged reduced layers take the same compensation (single-array side)
    red_m = make_reduced_model(make_singular_model(dense, merged_kernel=True), rank=12)
    qm = quantize_params(red_m)
    assert isinstance(qm.layers[0].wC, QuantizedTensor)
    out = reduced_lstm_apply(
        dequantize_params(qm), jnp.asarray(np.zeros((1, 4, 6), np.float32))
    )
    assert np.isfinite(np.asarray(out)).all()


def test_fake_quantize_matches_artifact_and_ste_grads(rng):
    """QAT view (utils/quantize.fake_quantize_params): forward values equal
    the artifact's layer encoding (compensation included), gradients are
    the straight-through identity — i.e. exactly the gradients of the
    forward evaluated AT the encoded point."""
    from svd_lstm_tpu.io.int8_export import dequantized_params as oracle
    from svd_lstm_tpu.utils.quantize import fake_quantize_params, qat_apply

    dense = init_stacked_lstm(jax.random.PRNGKey(5), input_dim=6, units=(10, 10))
    red = st.make_reduced_model(st.make_singular_model(dense, merged_kernel=False), rank=6)

    fq = jax.jit(fake_quantize_params)(red)
    enc = oracle(red, compensate=True)
    for lf, lo in zip(fq.layers, enc.layers):
        for a, b in zip(jax.tree.leaves(lf), jax.tree.leaves(lo)):
            # f32 jnp lstsq vs f64 np lstsq: same grid, scale-level noise
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)

    x = jnp.asarray(rng.normal(size=(1, 8, 6)), jnp.float32)
    loss = lambda p: jnp.sum(qat_apply(reduced_lstm_apply)(p, x) ** 2)  # noqa: E731
    g_qat = jax.grad(loss)(red)
    g_enc = jax.grad(lambda p: jnp.sum(reduced_lstm_apply(p, x) ** 2))(fq)
    for a, b in zip(jax.tree.leaves(g_qat), jax.tree.leaves(g_enc)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5)

    # sigma stays exact under the singular-family view, like quantize_params
    sm = st.make_singular_model(dense, merged_kernel=False)
    fqs = jax.jit(fake_quantize_params)(sm)
    np.testing.assert_array_equal(np.asarray(fqs.layers[0].ws), np.asarray(sm.layers[0].ws))
    assert not np.array_equal(np.asarray(fqs.layers[0].wl), np.asarray(sm.layers[0].wl))

    # refuses already-quantized trees instead of nesting
    with pytest.raises(ValueError, match="master"):
        fake_quantize_params(quantize_params(dense))


def test_qat_fit_reduces_artifact_error(rng):
    """A few QAT steps must reduce the ARTIFACT's loss (the quantized
    view's objective) on the training batch — the property the whole
    feature exists for."""
    import optax

    from svd_lstm_tpu.utils.quantize import qat_apply

    dense = init_stacked_lstm(jax.random.PRNGKey(6), input_dim=4, units=(8,))
    red = st.make_reduced_model(st.make_singular_model(dense, merged_kernel=False), rank=5)
    x = jnp.asarray(rng.normal(size=(8, 12, 4)), jnp.float32)
    y = jnp.asarray(rng.normal(size=(8,)), jnp.float32)

    qat_fn = qat_apply(reduced_lstm_apply)
    loss = lambda p: jnp.mean(  # noqa: E731
        (qat_fn(p, x, return_sequences=False)[..., 0] - y) ** 2
    )
    opt = optax.adam(1e-2)
    s = opt.init(red)

    @jax.jit
    def step(p, s):
        l, g = jax.value_and_grad(loss)(p)
        u, s = opt.update(g, s, p)
        return optax.apply_updates(p, u), s, l

    p, s, l0 = step(red, s)
    for _ in range(30):
        p, s, l = step(p, s)
    assert float(l) < float(l0)
