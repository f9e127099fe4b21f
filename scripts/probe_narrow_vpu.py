"""Where does the narrow fused train kernel's time go? (VERDICT r3 #3)

Hypothesis: at n=40 the padded dots are tiny (MXU floor ~2.2 ms at B=512)
yet the measured step is 4.3 ms — the VPU gate math (sigmoid/tanh on
(B, 4*128) blocks, fwd + the heavier bwd formula) may be the real floor.
Test: time the fused fwd kernel against a structurally identical variant
whose gate_update is replaced by linear slices (same dots, same streams,
no transcendentals). The delta IS the VPU gate share.
"""
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from svd_lstm_tpu.bench.devtime import device_time_ms
from svd_lstm_tpu.models.lstm import init_stacked_lstm
from svd_lstm_tpu.ops.pallas_train_fused import _fused_fwd, _pack_layers
from svd_lstm_tpu.ops.pallas_batched import LANE
from svd_lstm_tpu.ops.pallas_lstm import _gates_p
from svd_lstm_tpu.utils.linalg import pad_cols

F32 = jnp.float32
DEF = jax.lax.Precision.DEFAULT
T, d = 200, 16
UNITS = (40, 40, 40, 40)


def fused_fwd_nogates(layers, x):
    """_fused_fwd with gate_update replaced by linear slices."""
    T_, B, d_ = x.shape
    units = [l.units for l in layers]
    L = len(units)
    dp = LANE
    weights, _ = _pack_layers(layers)
    x_p = pad_cols(x.reshape(T_ * B, d_).astype(F32), dp)

    def kernel(x_ref, *refs):
        w_refs = refs[: 3 * L]
        h_out, c_out = refs[3 * L], refs[3 * L + 1]
        scr = refs[3 * L + 2 :]

        @pl.when(pl.program_id(0) == 0)
        def _():
            for s in scr:
                s[:] = jnp.zeros_like(s)

        inp = x_ref[:, :d_]
        for i in range(L):
            z = (
                jnp.dot(inp, w_refs[3 * i][:], precision=DEF,
                        preferred_element_type=F32)
                + jnp.dot(scr[2 * i][:, : units[i]], w_refs[3 * i + 1][:],
                          precision=DEF, preferred_element_type=F32)
                + w_refs[3 * i + 2][:]
            )
            h = z[:, :LANE] * 0.25   # linear stand-in, same shapes
            c = z[:, LANE : 2 * LANE] * 0.25
            scr[2 * i][:] = h
            scr[2 * i + 1][:] = c
            h_out[:, i * LANE : (i + 1) * LANE] = h
            c_out[:, i * LANE : (i + 1) * LANE] = c
            inp = h[:, : units[i]]

    spec = pl.BlockSpec((B, L * LANE), lambda t: (t, 0), memory_space=pltpu.VMEM)
    h_all, c_all = pl.pallas_call(
        kernel,
        grid=(T_,),
        in_specs=[pl.BlockSpec((B, dp), lambda t: (t, 0), memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(weights),
        out_specs=[spec, spec],
        out_shape=[jax.ShapeDtypeStruct((T_ * B, L * LANE), F32)] * 2,
        scratch_shapes=[pltpu.VMEM((B, LANE), F32)] * (2 * L),
    )(x_p, *weights)
    return h_all


params = init_stacked_lstm(jax.random.PRNGKey(0), d, UNITS)
layers = tuple(params.layers)
rng = np.random.default_rng(0)
for B in (32, 128, 256):
    x = jnp.asarray(rng.normal(size=(T, B, d)), F32)
    f_full = jax.jit(lambda xx: _fused_fwd(layers, xx, False)[0])
    f_lin = jax.jit(lambda xx: fused_fwd_nogates(layers, xx))
    jax.block_until_ready(f_full(x)); jax.block_until_ready(f_lin(x))
    a = device_time_ms(f_full, x)
    b = device_time_ms(f_lin, x)
    print(f"B={B}: fwd full-gates {a:.3f} ms   linear {b:.3f} ms   "
          f"gate-VPU share {a-b:.3f} ms ({(a-b)/a*100:.0f}%)", flush=True)
