"""Pipeline-parallel inference on the 8-virtual-device CPU mesh.

The wavefront schedule must reproduce ``stacked_lstm_apply`` exactly: the
padding trick is algebraically exact and the schedule only reorders
independent work (chunk c of layer l still sees chunk c-1's state and
layer l-1's chunk c).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from svd_lstm_tpu.factor.svd import make_reduced_model, make_singular_model
from svd_lstm_tpu.models.lstm import init_stacked_lstm, stacked_lstm_apply
from svd_lstm_tpu.models.reduced import reduced_lstm_apply
from svd_lstm_tpu.parallel.mesh import make_mesh
from svd_lstm_tpu.parallel.pipeline import (
    _pack_stages,
    _pack_stages_reduced,
    make_pipeline_inference,
)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(dp=4, tp=2)


def _ref(params, x, return_sequences=True):
    return np.asarray(
        stacked_lstm_apply(params, x, return_sequences=return_sequences)
    )


class TestPackStages:
    def test_pads_layer1_exactly(self):
        params = init_stacked_lstm(jax.random.PRNGKey(0), 5, (8, 8))
        Ws, Us, bs = _pack_stages(params, 2)
        assert Ws.shape == (2, 1, 8, 32)
        np.testing.assert_array_equal(np.asarray(Ws)[0, 0, :5], params.layers[0].W)
        np.testing.assert_array_equal(np.asarray(Ws)[0, 0, 5:], 0.0)
        np.testing.assert_array_equal(np.asarray(Us)[1, 0], params.layers[1].U)
        np.testing.assert_array_equal(np.asarray(bs)[1, 0], params.layers[1].b)

    def test_rejects_nonuniform_and_indivisible(self):
        bad = init_stacked_lstm(jax.random.PRNGKey(0), 5, (8, 16))
        with pytest.raises(ValueError, match="uniform"):
            _pack_stages(bad, 2)
        ok = init_stacked_lstm(jax.random.PRNGKey(0), 5, (8, 8, 8))
        with pytest.raises(ValueError, match="stages"):
            _pack_stages(ok, 2)

    def test_rejects_wide_input(self):
        wide = init_stacked_lstm(jax.random.PRNGKey(0), 12, (8, 8))
        with pytest.raises(ValueError, match="input_dim"):
            _pack_stages(wide, 2)


class TestPipelineInference:
    @pytest.mark.parametrize("n_stages", [2, 4])
    def test_matches_unsharded(self, mesh, n_stages):
        """4 layers over S stages, T not a multiple of ct (pad path),
        d < n (layer-1 pad path)."""
        params = init_stacked_lstm(jax.random.PRNGKey(1), 5, (8, 8, 8, 8))
        x = jnp.asarray(
            np.random.default_rng(0).normal(size=(2, 37, 5)), jnp.float32
        )
        run = make_pipeline_inference(mesh, n_stages=n_stages, ct=10)
        np.testing.assert_allclose(
            np.asarray(run(params, x)), _ref(params, x), atol=1e-6
        )

    def test_batch1_whole_run(self, mesh):
        """The headline workload shape: batch-1, one long sequence."""
        params = init_stacked_lstm(jax.random.PRNGKey(2), 8, (8, 8))
        x = jnp.asarray(
            np.random.default_rng(1).normal(size=(1, 64, 8)), jnp.float32
        )
        run = make_pipeline_inference(mesh, n_stages=2, ct=16)
        np.testing.assert_allclose(
            np.asarray(run(params, x)), _ref(params, x), atol=1e-6
        )

    def test_return_last_step(self, mesh):
        params = init_stacked_lstm(jax.random.PRNGKey(3), 5, (8, 8))
        x = jnp.asarray(
            np.random.default_rng(2).normal(size=(3, 21, 5)), jnp.float32
        )
        run = make_pipeline_inference(
            mesh, n_stages=2, ct=8, return_sequences=False
        )
        np.testing.assert_allclose(
            np.asarray(run(params, x)),
            _ref(params, x, return_sequences=False),
            atol=1e-6,
        )

    def test_multiple_layers_per_stage(self, mesh):
        params = init_stacked_lstm(jax.random.PRNGKey(4), 8, (8,) * 4)
        x = jnp.asarray(
            np.random.default_rng(3).normal(size=(2, 30, 8)), jnp.float32
        )
        run = make_pipeline_inference(mesh, n_stages=2, ct=6)
        np.testing.assert_allclose(
            np.asarray(run(params, x)), _ref(params, x), atol=1e-6
        )

    def test_stage_count_validation(self, mesh):
        with pytest.raises(ValueError, match="devices"):
            make_pipeline_inference(mesh, n_stages=16)

    def test_params_committed_to_other_mesh(self, mesh):
        """Params left on the full dp mesh by fit_dp must still feed a
        2-stage pp run (normalized onto the sub-mesh, not a device clash)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        params = init_stacked_lstm(jax.random.PRNGKey(5), 5, (8, 8))
        committed = jax.device_put(params, NamedSharding(mesh, P()))
        x = jnp.asarray(
            np.random.default_rng(6).normal(size=(2, 20, 5)), jnp.float32
        )
        run = make_pipeline_inference(mesh, n_stages=2, ct=8)
        np.testing.assert_allclose(
            np.asarray(run(committed, x)), _ref(params, x), atol=1e-6
        )


class TestPipelineReduced:
    """The compressed family under the same wavefront: folded two-step
    stages must equal ``reduced_lstm_apply`` (the folding identities are
    exact; rank padding only adds zero terms)."""

    def _reduced(self, key, d, units, merged, rank=None, cutoff=None):
        dense = init_stacked_lstm(jax.random.PRNGKey(key), d, units)
        smodel = make_singular_model(dense, merged_kernel=merged)
        return make_reduced_model(smodel, cutoff=cutoff, rank=rank)

    @pytest.mark.parametrize("merged", [True, False])
    def test_matches_unsharded(self, mesh, merged):
        rmodel = self._reduced(10, 5, (8, 8, 8, 8), merged, rank=5)
        x = jnp.asarray(
            np.random.default_rng(4).normal(size=(2, 37, 5)), jnp.float32
        )
        run = make_pipeline_inference(mesh, n_stages=2, ct=10)
        np.testing.assert_allclose(
            np.asarray(run(rmodel, x)),
            np.asarray(reduced_lstm_apply(rmodel, x)),
            atol=1e-5,
        )

    def test_split_pergate_ranks_batch1(self, mesh):
        """Cutoff-based truncation gives *different* ranks per gate and per
        layer — the rank-padding path — on the headline batch-1 shape."""
        rmodel = self._reduced(11, 8, (8, 8), merged=False, cutoff=0.5)
        ranks = {
            B.shape[1] for l in rmodel.layers for B in (*l.wB, *l.uB)
        }
        assert len(ranks) > 1, "fixture should exercise uneven ranks"
        x = jnp.asarray(
            np.random.default_rng(5).normal(size=(1, 64, 8)), jnp.float32
        )
        run = make_pipeline_inference(mesh, n_stages=2, ct=16)
        np.testing.assert_allclose(
            np.asarray(run(rmodel, x)),
            np.asarray(reduced_lstm_apply(rmodel, x)),
            atol=1e-5,
        )

    def test_pack_shapes(self):
        rmodel = self._reduced(12, 5, (8, 8), merged=False, rank=3)
        W1, W2, U1, U2, bs = _pack_stages_reduced(rmodel, 2)
        assert W1.shape == (2, 1, 8, 12)  # 4 gates × rank 3, d padded to n
        assert W2.shape == (2, 1, 12, 32)
        assert U1.shape == (2, 1, 8, 12)
        assert U2.shape == (2, 1, 12, 32)
        assert bs.shape == (2, 1, 32)
        # layer-1 d→n pad rows are zero
        np.testing.assert_array_equal(np.asarray(W1)[0, 0, 5:], 0.0)
