"""On-TPU compiled-Mosaic kernel regression suite (VERDICT r3 #2).

Every CPU test runs the Pallas kernels in interpret mode; compiled
divergence is a PROVEN bug class in this repo — the B>=512
reconstruction-fed remote-compiler crash (round 3c, memory "Mosaic batch
cliffs") was found by hand probes, not by tests. This suite turns that
evidence into one command:

    timeout 1700 python -m pytest tests/ -m tpu -q

run on the real backend (tests/conftest.py keeps it live under ``-m
tpu``), serialized — ONE TPU client at a time, whole run bounded by
``timeout`` per the wedge rules in CLAUDE.md. It asserts compiled ==
scan for every kernel family (inference: exact to ~1e-4 under the
package's f32 matmul default; training: DEFAULT-precision dots, checked
at bf16-class relative tolerance against the f32 scan autodiff) and
walks the chunk-dispatch batch boundaries around the measured compiler
cliffs (B in {136, 160} — the ADVICE r3 unprobed whole-batch window —
and {496, 512, 600, 997, 1024}).

Shapes are kept small (T <= 16 for training) so the suite is
compile-dominated, not compute-dominated; every pallas_call here still
lowers through the real Mosaic toolchain, which is the point.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.tpu

UNITS = (40, 40, 40, 40)  # the reference's flagship stack
D = 16


@pytest.fixture(scope="module", autouse=True)
def _require_tpu():
    if jax.devices()[0].platform == "cpu":
        pytest.skip("real TPU backend required (run via `-m tpu` with the "
                    "axon plugin on PYTHONPATH)")


@pytest.fixture(scope="module")
def dense_model():
    from svd_lstm_tpu.models.lstm import init_stacked_lstm

    return init_stacked_lstm(jax.random.PRNGKey(0), D, UNITS)


@pytest.fixture(scope="module")
def singular_model(dense_model):
    from svd_lstm_tpu.factor.svd import make_singular_model

    return make_singular_model(dense_model, merged_kernel=False)


@pytest.fixture(scope="module")
def reduced_model(singular_model):
    from svd_lstm_tpu.factor.svd import make_reduced_model

    return make_reduced_model(singular_model, rank=25)


def _x1(T=512, d=D, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(size=(T, d)), jnp.float32)


def _rel(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return float(np.abs(a - b).max() / (np.abs(b).max() + 1e-12))


# ------------------------------------------------------------ inference --


def test_fused_dense_compiled_exact(dense_model):
    from svd_lstm_tpu.models.lstm import stacked_lstm_apply
    from svd_lstm_tpu.ops.pallas_lstm import fused_dense_stack_pallas

    x = _x1()
    ref = stacked_lstm_apply(dense_model, x[None], return_sequences=True)[0]
    for layout in ("p", "compact"):
        out = fused_dense_stack_pallas(dense_model, x, layout=layout)
        err = float(jnp.abs(out - ref).max())
        assert err < 1e-4, f"layout={layout}: {err}"


def test_fused_singular_compiled_exact(singular_model, dense_model):
    from svd_lstm_tpu.factor.svd import make_singular_model
    from svd_lstm_tpu.models.singular import singular_lstm_apply
    from svd_lstm_tpu.ops.layouts import singular_forward_fused

    x = _x1()
    for merged in (False, True):
        sm = (
            singular_model
            if not merged
            else make_singular_model(dense_model, merged_kernel=True)
        )
        ref = singular_lstm_apply(sm, x[None], return_sequences=True)[0]
        out = singular_forward_fused(sm, x)
        err = float(jnp.abs(out - ref).max())
        assert err < 1e-4, f"merged={merged}: {err}"


def test_fused_reduced_compiled_exact(reduced_model):
    from svd_lstm_tpu.models.reduced import reduced_lstm_apply
    from svd_lstm_tpu.ops.layouts import reduced_forward_fused

    x = _x1()
    ref = reduced_lstm_apply(reduced_model, x[None], return_sequences=True)[0]
    out = reduced_forward_fused(reduced_model, x)
    assert float(jnp.abs(out - ref).max()) < 1e-4


def test_hybrid_kernels_compiled_exact():
    """Wide-model hybrid paths (hoisted x-side + Pallas recurrence):
    dense and folded two-step reduced, merged + split."""
    from svd_lstm_tpu.factor.svd import make_reduced_model, make_singular_model
    from svd_lstm_tpu.models.lstm import init_stacked_lstm, stacked_lstm_apply
    from svd_lstm_tpu.models.reduced import reduced_lstm_apply
    from svd_lstm_tpu.ops.pallas_lstm import (
        dense_forward_hybrid,
        reduced_forward_hybrid,
    )

    x = _x1(T=128)
    wp = init_stacked_lstm(jax.random.PRNGKey(1), D, (256, 256))
    ref = stacked_lstm_apply(wp, x[None], return_sequences=True)[0]
    out = dense_forward_hybrid(wp, x)
    assert float(jnp.abs(out - ref).max()) < 1e-4

    for merged in (True, False):
        rm = make_reduced_model(
            make_singular_model(wp, merged_kernel=merged), rank=32
        )
        rref = reduced_lstm_apply(rm, x[None], return_sequences=True)[0]
        rout = reduced_forward_hybrid(rm, x)
        err = float(jnp.abs(rout - rref).max())
        assert err < 1e-4, f"merged={merged}: {err}"


def test_batched_fast_compiled(dense_model):
    """Batched throughput fast path (bf16 x-side + VMEM-resident Pallas
    recurrence) vs the exact forward — bf16-class relative error."""
    from svd_lstm_tpu.api import predict
    from svd_lstm_tpu.models.lstm import init_stacked_lstm

    rng = np.random.default_rng(3)
    X = jnp.asarray(rng.normal(size=(32, 32, D)), jnp.float32)
    wp = init_stacked_lstm(jax.random.PRNGKey(2), D, (256, 256))
    exact = predict(wp, X, precision="exact")
    fast = predict(wp, X, precision="fast")
    scale = float(jnp.abs(exact).max())
    assert float(jnp.abs(fast - exact).max()) / scale < 2e-2


def test_batch1_fast_mode_compiled(dense_model, reduced_model):
    """Batch-1 fast mode (relaxed single-pass in-kernel dots) stays
    bf16-close to the exact kernel output."""
    from svd_lstm_tpu.api import predict

    x = _x1(T=256)
    for m in (dense_model, reduced_model):
        exact = predict(m, x, precision="exact")
        fast = predict(m, x, precision="fast")
        scale = float(jnp.abs(exact).max())
        assert float(jnp.abs(fast - exact).max()) / scale < 2e-2


# ------------------------------------------------------------- training --
#
# Train-kernel dots are DEFAULT precision (single-pass bf16 multiply, f32
# accumulate) by design; the f32 scan autodiff is the reference. 0.08
# relative per gradient leaf is ~10x the observed bf16 deviation at these
# shapes and far below the garbage any real kernel bug produces.

GRAD_RTOL = 0.08


def _grad_parity(params, fast_apply, scan_apply, B=32, T=16, d=D, seed=4,
                 rtol=GRAD_RTOL):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(B, T, d)), jnp.float32)
    y = jnp.asarray(rng.normal(size=(B,)), jnp.float32)

    def loss(fn):
        def f(p):
            pred = fn(p, x, return_sequences=False)[..., 0]
            return jnp.mean(jnp.square(pred - y))

        return f

    lk, gk = jax.jit(jax.value_and_grad(loss(fast_apply)))(params)
    lr, gr = jax.jit(jax.value_and_grad(loss(scan_apply)))(params)
    assert np.isfinite(float(lk))
    assert abs(float(lk) - float(lr)) / (abs(float(lr)) + 1e-12) < 0.02
    for a, b, path in zip(
        jax.tree.leaves(gk),
        jax.tree.leaves(gr),
        jax.tree_util.tree_leaves_with_path(gr),
    ):
        r = _rel(a, b)
        assert r < rtol, f"{jax.tree_util.keystr(path[0])}: rel {r}"


def test_train_kernel_narrow_compiled(dense_model):
    from svd_lstm_tpu.models.lstm import stacked_lstm_apply
    from svd_lstm_tpu.ops.pallas_train import stacked_lstm_apply_fast_train

    _grad_parity(dense_model, stacked_lstm_apply_fast_train, stacked_lstm_apply)


def test_train_kernel_uniform_wide_compiled():
    """Lane-aligned uniform stack: scan-over-layers whose body is the
    fully-fused layer kernel (ops/pallas_train_wide.py, round 4)."""
    from svd_lstm_tpu.models.lstm import init_stacked_lstm, stacked_lstm_apply
    from svd_lstm_tpu.ops.pallas_train import stacked_lstm_apply_fast_train

    wp = init_stacked_lstm(jax.random.PRNGKey(5), D, (128, 128))
    _grad_parity(wp, stacked_lstm_apply_fast_train, stacked_lstm_apply,
                 B=16, T=8)


def test_train_kernel_wide_fused_vs_split_compiled():
    """The fused-layer path (x-projection + weight grads in-kernel) and
    the round-3 split form must produce the same compiled training step:
    loss and every gradient leaf (both run DEFAULT-precision dots, so
    parity is tight, not bf16-class)."""
    import functools

    from svd_lstm_tpu.models.lstm import init_stacked_lstm
    from svd_lstm_tpu.ops.pallas_train import stacked_lstm_apply_fast_train

    wp = init_stacked_lstm(jax.random.PRNGKey(7), D, (256, 256))
    _grad_parity(
        wp,
        functools.partial(stacked_lstm_apply_fast_train, wide_fused=True),
        functools.partial(stacked_lstm_apply_fast_train, wide_fused=False),
        B=16, T=8, rtol=2e-3,
    )


def test_singular_finetune_kernel_compiled(singular_model):
    from svd_lstm_tpu.models.singular import singular_lstm_apply
    from svd_lstm_tpu.ops.singular_train import singular_lstm_apply_fast_train

    _grad_parity(singular_model, singular_lstm_apply_fast_train,
                 singular_lstm_apply)


def test_reduced_recovery_kernel_compiled(reduced_model):
    from svd_lstm_tpu.models.reduced import reduced_lstm_apply
    from svd_lstm_tpu.ops.reduced_train import reduced_lstm_apply_fast_train

    _grad_parity(reduced_model, reduced_lstm_apply_fast_train,
                 reduced_lstm_apply)


@pytest.fixture(scope="module")
def conv_hybrid():
    from svd_lstm_tpu.models.conv import init_conv_lstm

    return init_conv_lstm(
        jax.random.PRNGKey(6), in_channels=D, filters=15, kernel_size=10,
        units=(15, 15),
    )


def test_conv_train_kernel_compiled(conv_hybrid):
    """Round-4 conv-hybrid training path, COMPILED: the conv-fed fused
    kernel program is a new Mosaic program family (differentiated conv
    producer feeding the kernel pair) — this is its regression gate."""
    from svd_lstm_tpu.models.conv import conv_lstm_apply
    from svd_lstm_tpu.ops.conv_train import conv_lstm_apply_fast_train

    _grad_parity(conv_hybrid, conv_lstm_apply_fast_train, conv_lstm_apply)


def test_conv_singular_train_kernel_compiled(conv_hybrid):
    from svd_lstm_tpu.factor.svd import make_conv_singular_model
    from svd_lstm_tpu.models.conv import conv_singular_apply
    from svd_lstm_tpu.ops.conv_train import conv_singular_apply_fast_train

    cs = make_conv_singular_model(conv_hybrid)
    _grad_parity(cs, conv_singular_apply_fast_train, conv_singular_apply)


def test_conv_reduced_train_kernel_compiled(conv_hybrid):
    from svd_lstm_tpu.factor.svd import (
        make_conv_reduced_model,
        make_conv_singular_model,
    )
    from svd_lstm_tpu.models.conv import conv_reduced_apply
    from svd_lstm_tpu.ops.conv_train import conv_reduced_apply_fast_train

    cr = make_conv_reduced_model(make_conv_singular_model(conv_hybrid), rank=12)
    _grad_parity(cr, conv_reduced_apply_fast_train, conv_reduced_apply)


# ---------------------------------------------- chunk-dispatch boundaries --
#
# The measured Mosaic cliffs (memory "Mosaic batch cliffs", scripts/
# probe_finetune_b512_*.py, probe_train_dense_chunk.py): dense-weight
# whole-batch programs crash at B>=1024, reconstruction-fed at B>=512;
# the dispatch chunks past 496. These boundary runs would have caught the
# round-3 cliff as a test failure instead of a hand probe.


@pytest.mark.parametrize("B", [496, 512, 600, 997, 1024])
def test_dense_train_batch_boundary(dense_model, B):
    from svd_lstm_tpu.models.lstm import stacked_lstm_apply
    from svd_lstm_tpu.ops.pallas_train import stacked_lstm_apply_fast_train

    _grad_parity(dense_model, stacked_lstm_apply_fast_train,
                 stacked_lstm_apply, B=B, T=8, seed=B)


@pytest.mark.parametrize("B", [136, 160, 496, 512])
def test_singular_train_batch_boundary(singular_model, B):
    """Reconstruction-fed programs: B in {136, 160} covers the whole-batch
    window 129..191 the round-3 dispatch opened without an on-chip probe
    (ADVICE r3 #2); {496, 512} straddle the measured crash cliff (496 is
    the largest whole-batch, 512 must chunk)."""
    from svd_lstm_tpu.models.singular import singular_lstm_apply
    from svd_lstm_tpu.ops.singular_train import singular_lstm_apply_fast_train

    _grad_parity(singular_model, singular_lstm_apply_fast_train,
                 singular_lstm_apply, B=B, T=8, seed=B)


def test_conv_train_batch_boundary(conv_hybrid):
    """Conv-fed program past the chunk threshold (the rule ops/conv_train
    inherits from the reconstruction-fed path)."""
    from svd_lstm_tpu.models.conv import conv_lstm_apply
    from svd_lstm_tpu.ops.conv_train import conv_lstm_apply_fast_train

    _grad_parity(conv_hybrid, conv_lstm_apply_fast_train, conv_lstm_apply,
                 B=512, T=8, seed=7)


def test_train_kernel_compact_compiled(dense_model):
    """Compact gate layout (k gates per 128-lane block) compiled on the
    chip: forward + gradient parity vs the f32 scan at the flagship 4x40
    stack, whole-batch and through the balanced-chunk splitter."""
    from functools import partial

    from svd_lstm_tpu.models.lstm import stacked_lstm_apply
    from svd_lstm_tpu.ops.pallas_train import stacked_lstm_apply_fast_train

    fast = partial(stacked_lstm_apply_fast_train, compact=True)
    _grad_parity(dense_model, fast, stacked_lstm_apply)


@pytest.mark.parametrize("B", [512, 600])
def test_train_kernel_compact_batch_boundary(dense_model, B):
    """Compact + the shared chunk dispatch past the B=496 cliff."""
    from functools import partial

    from svd_lstm_tpu.models.lstm import stacked_lstm_apply
    from svd_lstm_tpu.ops.pallas_train import stacked_lstm_apply_fast_train

    fast = partial(stacked_lstm_apply_fast_train, compact=True)
    _grad_parity(dense_model, fast, stacked_lstm_apply, B=B, T=16)
