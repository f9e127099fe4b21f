"""Why does the 3x512 post-truncation recovery fine-tune diverge at
lr=3e-4? Sweep (lr, clip) at r=32, watch BOTH the windowed train loss and
the whole-run RMSE — distinguishes optimizer divergence from a
windowed-objective vs long-horizon mismatch."""
import dataclasses
import numpy as np
import jax
import jax.numpy as jnp
import optax

import svd_lstm_tpu as st
from svd_lstm_tpu.config import DataConfig, TrainConfig
from svd_lstm_tpu.data.dropbear import preprocess_raw
from svd_lstm_tpu.data.synthetic import synthetic_dropbear_raw
from svd_lstm_tpu.io.checkpoint import load_params
from svd_lstm_tpu.models.reduced import reduced_lstm_apply
from svd_lstm_tpu.train.finetune import finetune_reduced
from svd_lstm_tpu.train.loop import predict_full_run
from svd_lstm_tpu.train.metrics import rmse

ds = preprocess_raw(synthetic_dropbear_raw(duration=42.0, noise=1.5), DataConfig())
model = load_params("./model_saves/pretrained_3x512_n1.5.npz")
inv = lambda v: ds.pin_scaler.inverse_transform(np.asarray(v).reshape(-1, 1)).ravel()
y_true = inv(ds.y_test)
full_rmse = rmse(y_true, inv(predict_full_run(model, ds.X_test)))
print(f"full RMSE {full_rmse*1000:.3f} mm", flush=True)

smodel = st.make_singular_model(model, merged_kernel=True)
rmod0 = st.make_reduced_model(smodel, rank=32)
e0 = rmse(y_true, inv(predict_full_run(rmod0, ds.X_test, apply_fn=reduced_lstm_apply)))
print(f"raw truncation r=32: RMSE ratio {e0/full_rmse:.3f}", flush=True)

for lr, clip in [(3e-4, None), (1e-4, None), (3e-5, None), (1e-4, 0.5)]:
    opt = optax.adam(lr) if clip is None else optax.chain(
        optax.clip(clip), optax.adam(lr))
    cfg = TrainConfig(epochs=2, batch_size=128, num_windows=20_000,
                      window_len=200, learning_rate=lr)
    res = finetune_reduced(rmod0, ds.X_train, ds.y_train, cfg, verbose=False)
    # fit() builds its own optimizer from cfg.learning_rate unless passed;
    # use the fit-level optimizer hook for the clip variant
    if clip is not None:
        from svd_lstm_tpu.train.loop import fit
        from svd_lstm_tpu.train.finetune import reduced_apply_fn
        res = fit(rmod0, ds.X_train, ds.y_train, cfg=cfg,
                  apply_fn=reduced_apply_fn(rmod0), optimizer=opt)
    e = rmse(y_true, inv(predict_full_run(res.params, ds.X_test,
                                          apply_fn=reduced_lstm_apply)))
    print(f"lr={lr:g} clip={clip}: losses {np.round(res.history, 5).tolist()}  "
          f"whole-run RMSE ratio {e/full_rmse:.3f}", flush=True)
