"""Full-scale convergence check of the kernel-accelerated singular
fine-tune: the 10.5× step speedup must not change the science.

Runs the reference fine-tune stage (10 epochs, hoyer=0.01, 4×40, synthetic
DROPBEAR) twice from the same pre-trained model — exact f32 scan vs the
Pallas kernel engine (ops/singular_train.py) — and compares per-epoch
losses, σ-below-cutoff counts, truncated weight counts, and reduced-model
test RMSE.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_finetune_kernel_convergence.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

import svd_lstm_tpu as st
from svd_lstm_tpu.config import DataConfig, FactorConfig, TrainConfig
from svd_lstm_tpu.data.dropbear import preprocess_raw
from svd_lstm_tpu.data.synthetic import synthetic_dropbear_raw
from svd_lstm_tpu.ops.layouts import reduced_forward_dense_recurrent
from svd_lstm_tpu.train.finetune import finetune, harvest_sigmas
from svd_lstm_tpu.train.loop import fit

t0 = time.time()
print("devices:", jax.devices(), flush=True)

ds = preprocess_raw(synthetic_dropbear_raw(duration=30.0), DataConfig(split_time=22.0))
units = (40, 40, 40, 40)
params = st.init_stacked_lstm(jax.random.PRNGKey(0), 16, units)
res = fit(
    params, ds.X_train, ds.y_train,
    TrainConfig(num_windows=8192, window_len=200, epochs=8, batch_size=64,
                recurrence_kernel=True),
    verbose=False,
)
print(f"pre-train done at {time.time()-t0:.0f}s  loss {res.history[-1]:.5f}", flush=True)

smodel = st.make_singular_model(res.params, merged_kernel=False)
fcfg = FactorConfig(hoyer=0.01)

results = {}
for name, kernel in (("scan", False), ("kernel", True)):
    t1 = time.time()
    fres = finetune(
        smodel, ds.X_train, ds.y_train, fcfg,
        TrainConfig(num_windows=8192, window_len=200, epochs=10, batch_size=64,
                    recurrence_kernel=kernel),
    )
    wall = time.time() - t1
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
    y_m = ds.pin_scaler.inverse_transform(ds.y_test.reshape(-1, 1)).ravel()
    rmse_mm = float(np.sqrt(np.mean((pr_m - y_m) ** 2))) * 1e3
    results[name] = dict(
        losses=[round(h, 5) for h in fres.history],
        sigma_below=below, sigma_total=total, reduced_weights=red_w,
        rmse_mm=round(rmse_mm, 3), wall_s=round(wall, 1),
    )
    print(f"{name:6s}: wall {wall:6.1f}s  final loss {fres.history[-1]:.5f}  "
          f"sigma<0.05 {below}/{total}  reduced_w {red_w}  "
          f"RMSE {rmse_mm:.3f} mm", flush=True)

print("\nper-epoch losses:")
for e, (a, b) in enumerate(zip(results["scan"]["losses"], results["kernel"]["losses"])):
    print(f"  epoch {e}: scan {a:.5f}  kernel {b:.5f}  |Δ| {abs(a-b):.5f}")
