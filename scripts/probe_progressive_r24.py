"""Can progressive truncation rescue the r=24 knife-edge?

Direct truncation 512->24 lands on a long-horizon stability boundary
(BENCH_NOTES §round-5 wide recovery: gated recovery declines — every
ladder LR destabilizes the 40k-step rollout — and fast-precision dot
noise alone blows RMSE 3.5x). Hypothesis: the knife-edge is a property
of the TRUNCATION POINT, not of rank 24 itself — going through the
recoverable r=32 basin first (truncate->recover->re-factorize->truncate
->recover) may land a stable r=24 model.

Pipeline: pretrained 3x512 -> r=32 (gated recovery, known x1.01) ->
dense reconstruction of the recovered model -> merged singular ->
truncate to r=24 -> gated recovery. Compare whole-run test RMSE ratio
and fast-mode stability against the direct-r=24 row in
model_saves/wide_rank_accuracy.json.
"""
import numpy as np
import jax
import jax.numpy as jnp

import svd_lstm_tpu as st
from svd_lstm_tpu.config import DataConfig, TrainConfig
from svd_lstm_tpu.data.dropbear import preprocess_raw
from svd_lstm_tpu.data.synthetic import synthetic_dropbear_raw
from svd_lstm_tpu.io.checkpoint import load_params
from svd_lstm_tpu.models.reduced import reduced_lstm_apply
from svd_lstm_tpu.ops.reduced_train import reduced_dense_view
from svd_lstm_tpu.train.finetune import recover_reduced_gated
from svd_lstm_tpu.train.loop import predict_full_run
from svd_lstm_tpu.train.metrics import rmse

ds = preprocess_raw(synthetic_dropbear_raw(duration=42.0, noise=1.5), DataConfig())
model = load_params("./model_saves/pretrained_3x512_n1.5.npz")
inv = lambda v: ds.pin_scaler.inverse_transform(  # noqa: E731
    np.asarray(v).reshape(-1, 1)
).ravel()
y_true = inv(ds.y_test)
full_rmse = rmse(y_true, inv(predict_full_run(model, ds.X_test)))
print(f"full RMSE {full_rmse*1000:.3f} mm", flush=True)

rcfg = TrainConfig(batch_size=128, num_windows=20_000, window_len=200)


def ratio(rmod):
    return float(
        rmse(y_true, inv(predict_full_run(rmod, ds.X_test,
                                          apply_fn=reduced_lstm_apply)))
        / full_rmse
    )


def fast_ratio(rmod):
    x1 = jnp.asarray(ds.X_test[0])
    pred = inv(np.asarray(
        jax.jit(lambda p, xx: st.predict(p, xx, precision="fast"))(rmod, x1)
    )[:, 0])
    return float(rmse(y_true, pred) / full_rmse)


smodel = st.make_singular_model(model, merged_kernel=True)
r32 = st.make_reduced_model(smodel, rank=32)
print(f"r=32 raw ratio {ratio(r32):.3f}", flush=True)
r32_rec, info32 = recover_reduced_gated(
    r32, ds.X_train, ds.y_train, train_cfg=rcfg, verbose=True)
print(f"r=32 recovered ratio {ratio(r32_rec):.3f} "
      f"(accepted {info32['accepted_epochs']})", flush=True)

# re-factorize the RECOVERED model and truncate to 24
dense32 = reduced_dense_view(r32_rec)
s32 = st.make_singular_model(dense32, merged_kernel=True)
r24p = st.make_reduced_model(s32, rank=24)
print(f"r=24 progressive raw ratio {ratio(r24p):.3f}  "
      f"fast {fast_ratio(r24p):.3f}", flush=True)
r24p_rec, info24 = recover_reduced_gated(
    r24p, ds.X_train, ds.y_train, train_cfg=rcfg, verbose=True)
print(f"r=24 progressive recovered ratio {ratio(r24p_rec):.3f}  "
      f"fast {fast_ratio(r24p_rec):.3f}  "
      f"(accepted {info24['accepted_epochs']})", flush=True)

# reference point: the direct r=24 (knife-edge)
r24d = st.make_reduced_model(smodel, rank=24)
print(f"r=24 direct raw ratio {ratio(r24d):.3f}  fast {fast_ratio(r24d):.3f}",
      flush=True)
