"""Where does the narrow fused train kernel's BACKWARD time go?
(VERDICT r4 #3 — the fwd side was decomposed in probe_narrow_vpu.py:
gate VPU is 21-27% of the fwd kernel.)

The bwd kernel per timestep runs 6L dots (2L gate recompute, 2L weight
accs, L dh carries, L-1 inter-layer dz@W^T + 1 dx) plus the
gate_update_bwd formula (sigmoid/tanh recompute + derivative algebra) on
(B, 4*128) blocks. This probe times:

1. the full fwd kernel, the full bwd kernel (separately),
2. a structurally identical bwd with gate_update_bwd replaced by linear
   slices (same dots, same streams, no transcendentals/derivative algebra),

so `bwd_full - bwd_linear` IS the bwd VPU gate share, and the fwd/bwd
split shows where the train step's floor_fraction gap lives.
"""
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from svd_lstm_tpu.bench.devtime import device_time_ms
from svd_lstm_tpu.models.lstm import init_stacked_lstm
from svd_lstm_tpu.ops.pallas_train_fused import _fused_fwd, _fused_bwd, _pack_layers
from svd_lstm_tpu.ops.pallas_batched import LANE
from svd_lstm_tpu.utils.linalg import pad_cols

F32 = jnp.float32
DEF = jax.lax.Precision.DEFAULT
T, d = 200, 16
UNITS = (40, 40, 40, 40)


def _linear_gate_bwd(z, c_prev, c_new, dh, dc):
    """Shape-identical stand-in for models.lstm.gate_update_bwd: no
    transcendentals, no derivative algebra — a couple of scaled
    concatenations (VPU cost ~ a plain elementwise pass)."""
    dz = jnp.concatenate(
        [dh * 0.25, dh * 0.5, dc * 0.25, dh * 0.125], axis=1
    ) + z * 0.01
    dc_new = dh * 0.25 + dc * 0.5 + c_prev * 0.01 + c_new * 0.0
    return dz, dc_new


def fused_bwd_linear(layers, x, h_all, c_all, dh_last_seq):
    """_fused_bwd with gate_update_bwd -> _linear_gate_bwd. Same dots AND
    the same no-copy prev-block reads as the production kernel (round 5):
    the control arm must differ ONLY in the gate math, or the
    subtraction stops isolating the VPU share."""
    T_, B, d_ = x.shape
    units = [l.units for l in layers]
    L = len(units)
    dp = LANE
    weights, in_dims = _pack_layers(layers)
    wts = []
    for i in range(L):
        wts.append(pad_cols(weights[3 * i].T, LANE))
        wts.append(pad_cols(weights[3 * i + 1].T, LANE))
    x_p = pad_cols(x.reshape(T_ * B, d_).astype(F32), dp)
    dh_p = dh_last_seq.reshape(T_ * B, LANE).astype(F32)
    rev = lambda t: (T_ - 1 - t, 0)  # noqa: E731
    prev = lambda t: (jnp.maximum(T_ - 2 - t, 0), 0)  # noqa: E731

    def kernel(x_ref, ha_ref, hp_ref, ca_ref, cp_ref, dhl_ref, *refs):
        w_refs = refs[: 3 * L]
        wt_refs = refs[3 * L : 5 * L]
        dx_ref = refs[5 * L]
        dw_out = refs[5 * L + 1 : 5 * L + 1 + 3 * L]
        scr = refs[5 * L + 1 + 3 * L :]
        dh_scr = [scr[2 * i] for i in range(L)]
        dc_scr = [scr[2 * i + 1] for i in range(L)]
        acc = scr[2 * L :]
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            for s in scr:
                s[:] = jnp.zeros_like(s)

        first = t == T_ - 1
        dz_above = None
        for i in range(L - 1, -1, -1):
            u = units[i]
            blk = slice(i * LANE, (i + 1) * LANE)
            hp_l = jnp.where(first, 0.0, hp_ref[:, blk][:, :u])
            cp_l = jnp.where(first, 0.0, cp_ref[:, blk])
            dh = dh_scr[i][:]
            if i == L - 1:
                dh = dh + dhl_ref[:]
            if dz_above is not None:
                dh = dh + jnp.dot(dz_above, wt_refs[2 * (i + 1)][:],
                                  preferred_element_type=F32, precision=DEF)
            inp = (
                x_ref[:, :d_]
                if i == 0
                else ha_ref[:, (i - 1) * LANE : i * LANE][:, : units[i - 1]]
            )
            z = (
                jnp.dot(inp, w_refs[3 * i][:], preferred_element_type=F32,
                        precision=DEF)
                + jnp.dot(hp_l, w_refs[3 * i + 1][:],
                          preferred_element_type=F32, precision=DEF)
                + w_refs[3 * i + 2][:]
            )
            dz, dc_new = _linear_gate_bwd(
                z, cp_l, ca_ref[:, blk], dh, dc_scr[i][:]
            )
            acc[3 * i][: in_dims[i], :] += jnp.dot(
                inp.T, dz, preferred_element_type=F32, precision=DEF)
            acc[3 * i + 1][:u, :] += jnp.dot(
                hp_l.T, dz, preferred_element_type=F32,
                precision=DEF)
            acc[3 * i + 2][:] += jnp.broadcast_to(
                jnp.sum(dz, axis=0, keepdims=True), (8, 4 * LANE))
            dh_scr[i][:] = jnp.dot(dz, wt_refs[2 * i + 1][:],
                                   preferred_element_type=F32, precision=DEF)
            dc_scr[i][:] = dc_new
            dz_above = dz
        dx_ref[:] = jnp.dot(dz_above, wt_refs[0][:],
                            preferred_element_type=F32, precision=DEF)

        @pl.when(t == T_ - 1)
        def _():
            for k in range(3 * L):
                dw_out[k][:] = acc[k][:]

    sspec = pl.BlockSpec((B, L * LANE), rev, memory_space=pltpu.VMEM)
    out_shapes = [jax.ShapeDtypeStruct((T_ * B, dp), F32)]
    out_specs = [pl.BlockSpec((B, dp), rev, memory_space=pltpu.VMEM)]
    for i in range(L):
        out_shapes += [
            jax.ShapeDtypeStruct((LANE, 4 * LANE), F32),
            jax.ShapeDtypeStruct((LANE, 4 * LANE), F32),
            jax.ShapeDtypeStruct((8, 4 * LANE), F32),
        ]
        out_specs += [
            pl.BlockSpec((LANE, 4 * LANE), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((LANE, 4 * LANE), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 4 * LANE), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
    scratch = [pltpu.VMEM((B, LANE), F32)] * (2 * L)
    for _ in range(L):
        scratch += [
            pltpu.VMEM((LANE, 4 * LANE), F32),
            pltpu.VMEM((LANE, 4 * LANE), F32),
            pltpu.VMEM((8, 4 * LANE), F32),
        ]
    return pl.pallas_call(
        kernel,
        grid=(T_,),
        in_specs=[
            pl.BlockSpec((B, dp), rev, memory_space=pltpu.VMEM),
            sspec,
            pl.BlockSpec((B, L * LANE), prev, memory_space=pltpu.VMEM),
            sspec,
            pl.BlockSpec((B, L * LANE), prev, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, LANE), rev, memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (5 * L),
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=scratch,
    )(x_p, h_all.reshape(T_ * B, L * LANE), h_all.reshape(T_ * B, L * LANE),
      c_all.reshape(T_ * B, L * LANE), c_all.reshape(T_ * B, L * LANE),
      dh_p, *weights, *wts)[0]


def main():
    params = init_stacked_lstm(jax.random.PRNGKey(0), d, UNITS)
    layers = tuple(params.layers)
    rng = np.random.default_rng(0)
    for B in (32, 128, 256):
        x = jnp.asarray(rng.normal(size=(T, B, d)), F32)
        dh = jnp.asarray(rng.normal(size=(T, B, LANE)), F32) * 0.01

        fwd = jax.jit(lambda xx: _fused_fwd(layers, xx, False)[0])
        h_all, c_all = jax.jit(lambda xx: _fused_fwd(layers, xx, False))(x)

        bwd_full = jax.jit(
            lambda xx, dd: _fused_bwd(layers, xx, h_all, c_all, dd, False)[0][0]
        )
        bwd_lin = jax.jit(
            lambda xx, dd: fused_bwd_linear(layers, xx, h_all, c_all, dd)
        )
        jax.block_until_ready(fwd(x))
        jax.block_until_ready(bwd_full(x, dh))
        jax.block_until_ready(bwd_lin(x, dh))
        f = device_time_ms(fwd, x)
        bf = device_time_ms(bwd_full, x, dh)
        bl = device_time_ms(bwd_lin, x, dh)
        print(f"B={B}: fwd {f:.3f} ms   bwd full {bf:.3f} ms   "
              f"bwd linear-gates {bl:.3f} ms   "
              f"bwd gate-VPU share {bf - bl:.3f} ms ({(bf - bl) / bf * 100:.0f}%)",
              flush=True)


if __name__ == "__main__":
    main()
