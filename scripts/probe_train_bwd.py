"""Probe: where the training-step time goes — isolate fwd vs bwd of the
recurrence (3x512-scale single layer), and measure a Pallas backward
kernel with U/U^T resident and dU accumulated in VMEM scratch.

probe_train_kernel.py measured the fwd-kernel custom_vjp step at 25.2 ms
vs the XLA scan step's 19.7 — the XLA backward (gate recompute + dh + dU
dots, each re-streaming 4 MB of f32 weights per step) eats the forward
gain. Decomposition + the candidate fix, single layer B=128 T=200 n=512:

  fwd scan / fwd pallas             (forward only)
  vjp scan (autodiff fwd+bwd)       (the XLA baseline)
  vjp pallas-fwd + XLA bwd          (probe_train_kernel's C)
  vjp pallas-fwd + PALLAS bwd       (the candidate)
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from svd_lstm_tpu.bench.devtime import device_time_ms
from svd_lstm_tpu.ops.pallas_train import (
    _fwd_scan_hc,
    _pallas_fwd_hc,
    _trainable_bwd,
)

B, T, n = 128, 200, 512
DEF = jax.lax.Precision.DEFAULT


def pallas_bwd(xp, U, h_seq, c_seq, dh_seq, interpret: bool = False):
    """Reverse-time Pallas backward: U and U^T VMEM-resident, dU
    accumulated in f32 VMEM scratch, (dxp, dU) out. One timestep per grid
    iteration, reverse index map."""
    Tt, Bb, g4 = xp.shape
    zeros = jnp.zeros((1, Bb, n), jnp.float32)
    h_prev = jnp.concatenate([zeros, h_seq[:-1]], axis=0)
    c_prev = jnp.concatenate([zeros, c_seq[:-1]], axis=0)

    rev = lambda t: (Tt - 1 - t, 0)  # noqa: E731  — reverse time order

    def kernel(xp_ref, hp_ref, cp_ref, ct_ref, dh_ref, u_ref, ut_ref,
               dxp_ref, du_ref, dh_scr, dc_scr, du_scr):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            dh_scr[:] = jnp.zeros_like(dh_scr)
            dc_scr[:] = jnp.zeros_like(dc_scr)
            du_scr[:] = jnp.zeros_like(du_scr)

        dh = dh_ref[:] + dh_scr[:]
        z = xp_ref[:] + jnp.dot(hp_ref[:], u_ref[:],
                                preferred_element_type=jnp.float32, precision=DEF)
        i = jax.nn.sigmoid(z[:, :n])
        f = jax.nn.sigmoid(z[:, n : 2 * n])
        g = jnp.tanh(z[:, 2 * n : 3 * n])
        o = jax.nn.sigmoid(z[:, 3 * n :])
        tc = jnp.tanh(ct_ref[:])
        dc_tot = dc_scr[:] + dh * o * (1.0 - tc * tc)
        dz = jnp.concatenate(
            [
                dc_tot * g * i * (1.0 - i),
                dc_tot * cp_ref[:] * f * (1.0 - f),
                dc_tot * i * (1.0 - g * g),
                dh * tc * o * (1.0 - o),
            ],
            axis=-1,
        )
        dxp_ref[:] = dz
        dh_scr[:] = jnp.dot(dz, ut_ref[:], preferred_element_type=jnp.float32,
                            precision=DEF)
        dc_scr[:] = dc_tot * f
        du_scr[:] += jnp.dot(hp_ref[:].T, dz,
                             preferred_element_type=jnp.float32, precision=DEF)

        @pl.when(t == Tt - 1)
        def _():
            du_ref[:] = du_scr[:]

    flat = lambda a: a.reshape(Tt * Bb, -1)  # noqa: E731
    bspec = lambda w: pl.BlockSpec((Bb, w), rev, memory_space=pltpu.VMEM)  # noqa: E731
    dxp, dU = pl.pallas_call(
        kernel,
        grid=(Tt,),
        in_specs=[
            bspec(g4), bspec(n), bspec(n), bspec(n), bspec(n),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            bspec(g4),
            pl.BlockSpec((n, g4), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Tt * Bb, g4), jnp.float32),
            jax.ShapeDtypeStruct((n, g4), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((Bb, n), jnp.float32),
            pltpu.VMEM((Bb, n), jnp.float32),
            pltpu.VMEM((n, g4), jnp.float32),
        ],
        interpret=interpret,
    )(flat(xp), flat(h_prev), flat(c_prev), flat(c_seq), flat(dh_seq), U, U.T)
    return dxp.reshape(Tt, Bb, g4), dU


def main():
    rng = np.random.default_rng(0)
    U = jnp.asarray(rng.normal(size=(n, 4 * n)).astype(np.float32)) * 0.05
    xp = jnp.asarray(rng.normal(size=(T, B, 4 * n)).astype(np.float32))
    dh = jnp.asarray(rng.normal(size=(T, B, n)).astype(np.float32))

    # correctness of the pallas bwd vs the XLA bwd
    h_seq, c_seq = jax.jit(_fwd_scan_hc)(xp, U)
    dxp_ref, dU_ref = jax.jit(_trainable_bwd)((xp, U, h_seq, c_seq), dh)
    f_pb = jax.jit(pallas_bwd)
    dxp_p, dU_p = f_pb(xp, U, h_seq, c_seq, dh)
    print("pallas-bwd errs:",
          float(jnp.abs(dxp_p - dxp_ref).max()),
          float(jnp.abs(dU_p - dU_ref).max() / jnp.abs(dU_ref).max()))

    f_fwd_scan = jax.jit(lambda xp, U: _fwd_scan_hc(xp, U)[0])
    f_fwd_pal = jax.jit(lambda xp, U: _pallas_fwd_hc(xp, U, 512, False)[0])

    def vjp_scan(xp, U, dh):
        _, pull = jax.vjp(lambda a, b: _fwd_scan_hc(a, b)[0], xp, U)
        return pull(dh)

    def vjp_custom_xla(xp, U, dh):
        h_seq, c_seq = _pallas_fwd_hc(xp, U, 512, False)
        return _trainable_bwd((xp, U, h_seq, c_seq), dh)

    def vjp_custom_pallas(xp, U, dh):
        h_seq, c_seq = _pallas_fwd_hc(xp, U, 512, False)
        return pallas_bwd(xp, U, h_seq, c_seq, dh)

    for name, fn, args in [
        ("fwd scan           ", f_fwd_scan, (xp, U)),
        ("fwd pallas         ", f_fwd_pal, (xp, U)),
        ("vjp scan (autodiff)", jax.jit(vjp_scan), (xp, U, dh)),
        ("vjp pal-fwd+xla-bwd", jax.jit(vjp_custom_xla), (xp, U, dh)),
        ("vjp pal-fwd+pal-bwd", jax.jit(vjp_custom_pallas), (xp, U, dh)),
    ]:
        try:
            t = device_time_ms(fn, *args)
            print(f"{name}: {t:8.3f} ms")
        except Exception as e:
            print(f"{name}: FAILED {str(e)[:110]}")


if __name__ == "__main__":
    main()
