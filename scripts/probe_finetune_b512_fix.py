"""Probe: workarounds for the B>128 singular fine-tune compiler crash.

ops/singular_train.py documents a Mosaic toolchain limit: at B=512 the
program (differentiated dense-reconstruction matmuls + the fused
whole-stack fwd/bwd kernel pair of ops/pallas_train_fused.py) crashes the
remote compiler, so the public path falls back to the exact XLA scan for
B > 128. BENCH_NOTES records the crash family as a *scheduling* bug
(flipping instruction order flips crash<->ok), so program restructurings
that keep the same math are plausible fixes. This probe tries, at
B in {192, 512} (both above the guard):

  A  baseline repro — autodiff through the HIGHEST-precision
     reconstruction feeding the fused kernel pair (expected FAILED)
  B  optimization_barrier between the reconstructed dense params and the
     kernel call (blocks cross-boundary fusion/scheduling; linear, so
     autodiff transposes it to a barrier in the backward too)
  C  custom-VJP reconstruction — forward identical, backward replaced by
     the explicit linear-map einsums (dsigma = diag(U^T dW V) etc.), so
     XLA never sees "differentiated" reconstruction matmuls
  D  jax.checkpoint around the reconstruction (remat: backward re-runs
     the reconstruction instead of transposing the saved one)
  E  DEFAULT-precision reconstruction (single-pass bf16 dots; perturbs the
     weights themselves — numerics fallback of last resort)

Whichever compiles is timed (device time) and grad-parity-checked against
the bf16 scan at the same shape. Run serially on the one real chip.
"""

import numpy as np
import jax
import jax.numpy as jnp

from svd_lstm_tpu.bench.devtime import device_time_ms
from svd_lstm_tpu.config import FactorConfig
from svd_lstm_tpu.factor.svd import make_singular_model
from svd_lstm_tpu.models.lstm import (
    LSTMLayerParams,
    StackedLSTMParams,
    init_stacked_lstm,
)
from svd_lstm_tpu.models.singular import SingularModelParams, singular_lstm_apply
from svd_lstm_tpu.ops.pallas_train import stacked_lstm_apply_fast_train
from svd_lstm_tpu.ops.singular_train import _dense_matrix, singular_dense_view
from svd_lstm_tpu.train.finetune import make_finetune_optimizer, regularization_loss

T, d = 200, 16
UNITS = (40, 40, 40, 40)
HI = jax.lax.Precision.HIGHEST


# --- variant B: optimization barrier ------------------------------------
def view_barrier(sp):
    dense = singular_dense_view(sp)
    flat, td = jax.tree.flatten(dense)
    return jax.tree.unflatten(td, jax.lax.optimization_barrier(tuple(flat)))


# --- variant C: custom-VJP reconstruction with explicit backward --------
def _recon_bwd_matrix(left, sigma, right, dW):
    """Cotangents of (left.diag(sigma)).right wrt (left, sigma, right)."""
    if left.ndim == 3:  # split: (4,d,k),(4,k),(4,k,n); dW (d, 4n)
        dd = dW.shape[0]
        n = right.shape[2]
        dWg = jnp.transpose(dW.reshape(dd, 4, n), (1, 0, 2))  # (4,d,n)
        dscaled = jnp.einsum("gdn,gkn->gdk", dWg, right, precision=HI)
        dleft = dscaled * sigma[:, None, :]
        dsigma = jnp.einsum("gdk,gdk->gk", dscaled, left, precision=HI)
        dright = jnp.einsum("gdk,gdn->gkn", left * sigma[:, None, :], dWg,
                            precision=HI)
        return dleft, dsigma, dright
    dscaled = jnp.dot(dW, right.T, precision=HI)          # (d, k)
    dleft = dscaled * sigma
    dsigma = jnp.sum(dscaled * left, axis=0)
    dright = jnp.dot((left * sigma).T, dW, precision=HI)  # (k, 4n)
    return dleft, dsigma, dright


@jax.custom_vjp
def view_cv(sp):
    return singular_dense_view(sp)


def _view_cv_fwd(sp):
    return singular_dense_view(sp), sp


def _view_cv_bwd(sp, ddense):
    layers = []
    for p, dl in zip(sp.layers, ddense.layers):
        dwl, dws, dwr = _recon_bwd_matrix(p.wl, p.ws, p.wr, dl.W)
        dul, dus, dur = _recon_bwd_matrix(p.ul, p.us, p.ur, dl.U)
        layers.append(
            type(p)(wl=dwl, ws=dws, wr=dwr, ul=dul, us=dus, ur=dur, b=dl.b)
        )
    return (type(sp)(layers=tuple(layers), head=ddense.head),)


view_cv.defvjp(_view_cv_fwd, _view_cv_bwd)


# --- variant D: remat ----------------------------------------------------
view_remat = jax.checkpoint(singular_dense_view)


# --- variant E: DEFAULT-precision reconstruction -------------------------
def view_fast(sp):
    DEF = jax.lax.Precision.DEFAULT

    def mat(left, sigma, right):
        if left.ndim == 3:
            scaled = left * sigma[:, None, :]
            per_gate = jnp.einsum("gdk,gkn->gdn", scaled, right, precision=DEF)
            return jnp.transpose(per_gate, (1, 0, 2)).reshape(left.shape[1], -1)
        return jnp.dot(left * sigma, right, precision=DEF)

    return StackedLSTMParams(
        layers=tuple(
            LSTMLayerParams(W=mat(p.wl, p.ws, p.wr), U=mat(p.ul, p.us, p.ur),
                            b=p.b)
            for p in sp.layers
        ),
        head=sp.head,
    )


def main():
    rng = np.random.default_rng(0)
    dense = init_stacked_lstm(jax.random.PRNGKey(0), d, UNITS)
    fcfg = FactorConfig(hoyer=0.01)
    sparams = make_singular_model(dense, merged_kernel=fcfg.merged_kernel)
    opt = make_finetune_optimizer(sparams, fcfg)
    s0 = opt.init(sparams)

    # cheap on-device sanity of the explicit backward (the full random-
    # cotangent parity, split AND merged, runs on CPU in
    # tests/test_singular_train_kernel.py):
    def probe_scalar(view):
        def f(p):
            v = view(p)
            return sum(jnp.sum(l.W) * 0.001 + jnp.sum(l.U) * 0.002
                       for l in v.layers)
        return jax.grad(f)(sparams)

    errs = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()),
        probe_scalar(singular_dense_view), probe_scalar(view_cv),
    )
    print("view_cv backward max err:", max(jax.tree.leaves(errs)))

    import optax

    def mk_step(view_fn):
        def loss(p, xx, yy):
            pred = stacked_lstm_apply_fast_train(
                view_fn(p), xx, return_sequences=False
            )[..., 0]
            return jnp.mean((pred - yy) ** 2) + regularization_loss(p, fcfg)

        @jax.jit
        def step(p, s, xx, yy):
            l, g = jax.value_and_grad(loss)(p, xx, yy)
            u, s = opt.update(g, s, p)
            return optax.apply_updates(p, u), s, l

        return step

    def mk_scan_step(scope):
        def loss(p, xx, yy):
            pred = singular_lstm_apply(p, xx, return_sequences=False)[..., 0]
            return jnp.mean((pred - yy) ** 2) + regularization_loss(p, fcfg)

        @jax.jit
        def step(p, s, xx, yy):
            with jax.default_matmul_precision(scope):
                l, g = jax.value_and_grad(loss)(p, xx, yy)
            u, s = opt.update(g, s, p)
            return optax.apply_updates(p, u), s, l

        return step

    variants = [
        ("A baseline (repro)   ", mk_step(singular_dense_view)),
        ("B opt-barrier        ", mk_step(view_barrier)),
        ("C custom-vjp recon   ", mk_step(view_cv)),
        ("D remat recon        ", mk_step(view_remat)),
        ("E DEFAULT-prec recon ", mk_step(view_fast)),
    ]

    for B in (192, 512):
        x = jnp.asarray(rng.normal(size=(B, T, d)).astype(np.float32))
        y = jnp.asarray(rng.normal(size=(B,)).astype(np.float32))
        print(f"-- B={B}")
        t_scan = device_time_ms(mk_scan_step("bfloat16"), sparams, s0, x, y)
        print(f"  bf16 scan          : {t_scan:8.3f} ms/step")
        for name, fn in variants:
            try:
                t = device_time_ms(fn, sparams, s0, x, y)
                print(f"  {name}: {t:8.3f} ms/step")
            except Exception as e:  # noqa: BLE001 — crash rows expected
                print(f"  {name}: FAILED {str(e)[:100]}")


if __name__ == "__main__":
    main()
