"""Sparsifier efficacy comparison: Hoyer (the reference's regularizer,
code/svd_classes_v3.py:455-465) vs the beyond-reference trace-norm (L1 on
σ = nuclear norm of the factorized matrix) — does each fine-tune actually
push σ below the truncation cutoff, and at what RMSE cost?

Same end-to-end protocol as scripts/hoyer_experiment.py (train →
factorize → regularized fine-tune → cutoff-truncate → compare), on the
synthetic DROPBEAR surrogate. Efficacy (σ-kill counts, weight reduction,
RMSE deltas) is hardware-independent, so this runs fine on CPU —
`JAX_PLATFORMS=cpu python scripts/sparsifier_comparison.py [--quick]`.

Rows compared (trace_norm is NOT scale-invariant like Hoyer's L1/L2
ratio, so its coefficient sweeps decades):
  none | hoyer=0.01 | tn=3e-4 | tn=1e-3 | tn=3e-3 | hoyer=0.01+tn=1e-3
"""
import argparse
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

import svd_lstm_tpu as st
from svd_lstm_tpu.config import DataConfig, FactorConfig, TrainConfig
from svd_lstm_tpu.data.dropbear import preprocess_raw
from svd_lstm_tpu.data.synthetic import synthetic_dropbear_raw
from svd_lstm_tpu.train.finetune import finetune, harvest_sigmas
from svd_lstm_tpu.train.loop import fit, predict_full_run
from svd_lstm_tpu.ops.layouts import reduced_forward_dense_recurrent

ap = argparse.ArgumentParser()
ap.add_argument("--quick", action="store_true", help="tiny smoke run")
ap.add_argument("--windows", type=int, default=4096)
ap.add_argument("--epochs", type=int, default=6)
args = ap.parse_args()

t0 = time.time()
print("devices:", jax.devices(), flush=True)

if args.quick:
    duration, units, windows, epochs, wlen = 6.0, (12, 12), 256, 2, 60
else:
    duration, units, windows, epochs, wlen = 30.0, (40, 40, 40, 40), args.windows, args.epochs, 200

ds = preprocess_raw(
    synthetic_dropbear_raw(duration=duration),
    DataConfig(split_time=duration * 22 / 30),
)
print(f"data: T={ds.X.shape[1]} train={ds.X_train.shape[1]} test={ds.X_test.shape[1]}", flush=True)

params = st.init_stacked_lstm(jax.random.PRNGKey(0), 16, units)
res = fit(params, ds.X_train, ds.y_train,
          TrainConfig(num_windows=windows, window_len=wlen, epochs=epochs + 2, batch_size=64),
          verbose=True)
print(f"train done at {time.time()-t0:.0f}s", flush=True)

smodel = st.make_singular_model(res.params, merged_kernel=False)

y_m = ds.pin_scaler.inverse_transform(ds.y_test.reshape(-1, 1)).ravel()
pf = predict_full_run(res.params, ds.X_test)
pf_m = ds.pin_scaler.inverse_transform(pf.reshape(-1, 1)).ravel()
full_w = sum(int(np.asarray(x).size) for L in res.params.layers for x in L)
rmse_full = st.rmse(y_m, pf_m) * 1000
print(f"full model: {full_w} weights, RMSE {rmse_full:.3f} mm", flush=True)

# NB: FactorConfig's default is hoyer=0.01 (the reference driver's
# setting) — every row must set hoyer explicitly or it sneaks in.
CONFIGS = [
    ("none", FactorConfig(hoyer=0.0)),
    ("hoyer=0.01", FactorConfig(hoyer=0.01)),
    ("tn=3e-4", FactorConfig(hoyer=0.0, trace_norm=3e-4)),
    ("tn=1e-3", FactorConfig(hoyer=0.0, trace_norm=1e-3)),
    ("tn=3e-3", FactorConfig(hoyer=0.0, trace_norm=3e-3)),
    ("hoyer=0.01+tn=1e-3", FactorConfig(hoyer=0.01, trace_norm=1e-3)),
]

for name, fcfg in CONFIGS:
    fres = finetune(
        smodel, ds.X_train, ds.y_train, fcfg,
        TrainConfig(num_windows=windows, window_len=wlen, epochs=epochs, batch_size=64),
    )
    sig = harvest_sigmas(fres.params)
    below = sum(int((su < 0.05).sum()) for _, su in sig) + sum(
        int((sw < 0.05).sum()) for sw, _ in sig
    )
    total = sum(su.size for _, su in sig) + sum(sw.size for sw, _ in sig)

    rmodel = st.make_reduced_model(fres.params, cutoff=0.05)
    red_w = sum(l.weight_count() for l in rmodel.layers)
    red_fn = jax.jit(
        lambda p, xx: reduced_forward_dense_recurrent(p, xx, return_sequences=True)
    )
    pr = np.asarray(red_fn(rmodel, jnp.asarray(ds.X_test)))[0, :, 0]
    pr_m = ds.pin_scaler.inverse_transform(pr.reshape(-1, 1)).ravel()

    print(json.dumps({
        "regularizer": name,
        "finetune_loss": fres.history[-1] if fres.history else None,
        "sigma_below_cutoff": f"{below}/{total}",
        "weights": f"{full_w}->{red_w}",
        "weight_reduction_pct": round(100 - 100 * red_w / full_w, 2),
        "rmse_full_mm": round(rmse_full, 3),
        "rmse_reduced_mm": round(st.rmse(y_m, pr_m) * 1000, 3),
        "snr_reduced_db": round(st.signaltonoise(y_m, pr_m), 2),
        "elapsed_s": round(time.time() - t0),
    }), flush=True)
