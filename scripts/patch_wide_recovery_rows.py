"""Re-measure ONLY the recovery rows of model_saves/wide_rank_accuracy.json
with the clipped recovery recipe (examples/wide_rank_accuracy.py after the
clip fix) — the raw-truncation RMSE, weights and timing rows are already
measured and unchanged, so this avoids repaying the ~15 min full-artifact
run for a recovery-only fix. Rewrites the JSON rows and the paired plot
(same rendering as the example)."""

import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import optax

import svd_lstm_tpu as st
from svd_lstm_tpu.config import DataConfig, TrainConfig
from svd_lstm_tpu.data.dropbear import preprocess_raw
from svd_lstm_tpu.data.synthetic import synthetic_dropbear_raw
from svd_lstm_tpu.io.checkpoint import load_params
from svd_lstm_tpu.models.reduced import reduced_lstm_apply
from svd_lstm_tpu.train.loop import fit, predict_full_run
from svd_lstm_tpu.train.metrics import rmse

ART = "./model_saves/wide_rank_accuracy.json"
PLOT = "./plots/wide_rank_accuracy.png"
LR = 3e-5

with open(ART) as f:
    art = json.load(f)

ds = preprocess_raw(synthetic_dropbear_raw(duration=42.0, noise=1.5), DataConfig())
model = load_params("./model_saves/pretrained_3x512_n1.5.npz")
inv = lambda v: ds.pin_scaler.inverse_transform(  # noqa: E731
    np.asarray(v).reshape(-1, 1)
).ravel()
y_true = inv(ds.y_test)
full_rmse = art["full_rmse_mm"] / 1000.0
smodel = st.make_singular_model(model, merged_kernel=True)

rcfg = TrainConfig(
    epochs=2, batch_size=128, num_windows=20_000, window_len=200,
    learning_rate=LR,
)
for row in art["rows"]:
    if "rmse_recovered_mm" not in row:
        continue
    r = row["rank"]
    rmod = st.make_reduced_model(smodel, rank=r)
    rec = fit(
        rmod, ds.X_train, ds.y_train, rcfg,
        apply_fn=reduced_lstm_apply,
        optimizer=optax.chain(optax.clip(0.5), optax.adam(LR)),
    ).params
    e_r = rmse(y_true, inv(predict_full_run(rec, ds.X_test,
                                            apply_fn=reduced_lstm_apply)))
    row["rmse_recovered_mm"] = round(float(e_r * 1000), 4)
    row["recovered_ratio"] = round(float(e_r / full_rmse), 4)
    print(f"r={r:3d}: recovered x{row['recovered_ratio']:.3f}", flush=True)

art["config"]["recover"] = {"lr": LR, "clip": 0.5, "epochs": 2}
with open(ART, "w") as f:
    json.dump(art, f, indent=1)
print(f"rewrote {ART}")

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

rows = art["rows"]
fig, ax1 = plt.subplots(figsize=(7, 4.2))
rs = [row["rank"] for row in rows]
ax1.plot(rs, [row["rmse_ratio"] for row in rows], "o-", color="tab:blue",
         label="RMSE(reduced)/RMSE(full)")
rec_pts = [(row["rank"], row["recovered_ratio"]) for row in rows
           if "recovered_ratio" in row]
ax1.plot(*zip(*rec_pts), "^-", color="tab:green",
         label="after recovery fine-tune")
ax1.legend(loc="upper left", fontsize=8)
ax1.axhline(1.0, color="gray", lw=0.6)
ax1.set_xlabel("retained rank r (of 512)")
ax1.set_ylabel("RMSE ratio", color="tab:blue")
ax1.set_xscale("log", base=2)
ax1.invert_xaxis()
ax2 = ax1.twinx()
ax2.plot(rs, [row["timing_ratio"] for row in rows], "s--",
         color="tab:red", label="time(reduced)/time(full)")
ax2.set_ylabel("device-time ratio", color="tab:red")
ax2.axhline(1.0, color="tab:red", lw=0.5, ls=":")
fig.suptitle("3x512 merged truncation: accuracy AND timing vs rank")
fig.tight_layout()
fig.savefig(PLOT, dpi=120)
print(f"rewrote {PLOT}")
