"""Gated QAT on the headline wide r=24 progressive model: does training
through the int8 grid close the wide reduced artifact's quantization
noise (measured ~0.21 rel err, BENCH_NOTES §deployment surfaces) the way
it did at narrow scale (noise 0.15 -> 0.047, §QAT)?

Gate metric = whole-run MSE of the FAKE-QUANTIZED view on the train half
— the accepted model is the one whose int8 ARTIFACT improves, and the
knife-edge protection of the gated recovery applies to QAT verbatim.
"""
import numpy as np

from svd_lstm_tpu.config import DataConfig, TrainConfig
from svd_lstm_tpu.data.dropbear import preprocess_raw
from svd_lstm_tpu.data.synthetic import synthetic_dropbear_raw
from svd_lstm_tpu.io.checkpoint import load_params, save_params
from svd_lstm_tpu.models.reduced import reduced_lstm_apply
from svd_lstm_tpu.train.finetune import recover_reduced_gated
from svd_lstm_tpu.train.loop import predict_full_run
from svd_lstm_tpu.train.metrics import rmse
from svd_lstm_tpu.utils.quantize import fake_quantize_params, qat_apply

ds = preprocess_raw(synthetic_dropbear_raw(duration=42.0, noise=1.5), DataConfig())
dense = load_params("./model_saves/pretrained_3x512_n1.5.npz")
rmod = load_params("./model_saves/wide_r24_progressive.npz")
inv = lambda v: ds.pin_scaler.inverse_transform(  # noqa: E731
    np.asarray(v).reshape(-1, 1)
).ravel()
y_true = inv(ds.y_test)
full_rmse = rmse(y_true, inv(predict_full_run(dense, ds.X_test)))


def report(tag, p):
    e = rmse(y_true, inv(predict_full_run(p, ds.X_test,
                                          apply_fn=reduced_lstm_apply)))
    q = fake_quantize_params(p)
    eq = rmse(y_true, inv(predict_full_run(q, ds.X_test,
                                           apply_fn=reduced_lstm_apply)))
    print(f"{tag}: f32 ratio {e/full_rmse:.3f}  int8-view ratio "
          f"{eq/full_rmse:.3f}", flush=True)


report("before QAT", rmod)
rcfg = TrainConfig(batch_size=128, num_windows=20_000, window_len=200)
qat, info = recover_reduced_gated(
    rmod, ds.X_train, ds.y_train, train_cfg=rcfg,
    apply_fn=qat_apply(reduced_lstm_apply),
    verbose=True,
)
report("after gated QAT", qat)
print("accepted epochs:", info["accepted_epochs"], flush=True)
save_params("./model_saves/wide_r24_progressive_qat.npz", qat)
print("saved model_saves/wide_r24_progressive_qat.npz", flush=True)
