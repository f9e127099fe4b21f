"""Reproduce the PUBLISHED rank-RMSE experiment configuration (slide 13).

The reference's headline accuracy result (`plots/RMSE_plot.png`, slide 13;
generator workflow code/old_versions/svd_acceleration.py:125-157 with
per-layer reduction via set_model_matrix_rank / make_Reduced_LSTM_Cell,
old_versions/svd_classes.py:193-217) is:

    4×30-unit stacked LSTM, cells 2–3 reduced (1-based; layers[1] and
    layers[2]), every W and U gate block truncated to rank r = 30−k,
    k swept 0..19 — RMSE(reduced)/RMSE(full) stays ≈1.00 flat until
    k ≈ 15, ~1.1 at 17, >2 by 19.

This script reproduces that exact configuration on the DROPBEAR pipeline
(synthetic surrogate when the raw JSON is absent — upstream stripped it)
and asserts the flat-to-k≈15 property. The published plot came from the v1
pipeline (reference code/old_versions/load_preprocess.py: ds=64 downsample,
1-wide frames), so the default here is 1-wide frames at an ~800 Hz step
rate; --pipeline v4 runs the same sweep on the 16-wide-frame v3/v4
pipeline instead (measured: the 16-wide model is less truncation-tolerant
— each step carries 16× more input information, so the recurrent kernels
are less redundant; see model_saves/rank_rmse_30units.json "config").

Truncation uses rank-truncated dense reconstruction (reduce_matrix_rank,
parity with reference set_model_matrix_rank, old_versions/svd_classes.py:
210-217), which produces bit-identical predictions to the two-step reduced
cell — the two-step is an exact reparameterization.

Artifacts: plots/RMSE_plot_30units.png + model_saves/rank_rmse_30units.json
(consumed by tests/test_sweep_viz.py's published-config check).

Usage:
    python examples/rank_rmse_published.py [--quick] [--epochs N]
"""

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

UNITS = (30, 30, 30, 30)
REDUCED_LAYERS = (1, 2)      # cells 2-3, 1-based (slide 13)
KS = list(range(20))         # k = n - r = 0..19


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="small-scale CPU smoke run")
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument(
        "--pipeline",
        choices=("v1", "v4"),
        default="v1",
        help="v1 = 1-wide frames @ ~800 Hz (the published plot's pipeline); "
        "v4 = 16-wide frames @ 2 kHz steps",
    )
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--out", default="./model_saves/rank_rmse_30units.json")
    ap.add_argument("--plot", default="./plots/RMSE_plot_30units.png")
    args = ap.parse_args()
    if args.ckpt is None:
        args.ckpt = f"./model_saves/pretrained_30units_{args.pipeline}.npz"

    import jax

    import svd_lstm_tpu as st
    from svd_lstm_tpu.config import DataConfig, TrainConfig
    from svd_lstm_tpu.data import preprocess
    from svd_lstm_tpu.factor.svd import set_model_matrix_rank
    from svd_lstm_tpu.io.checkpoint import load_params, save_params
    from svd_lstm_tpu.train.loop import fit, predict_full_run
    from svd_lstm_tpu.train.metrics import rmse

    if args.pipeline == "v1":
        # reference old_versions/load_preprocess.py: ds=64 downsample of the
        # raw acceleration, one sample per LSTM step
        dcfg = DataConfig(sampling_period=1.0 / 800.0, frame_width=1)
    else:
        dcfg = DataConfig()
    input_dim = dcfg.frame_width

    if args.quick:
        from svd_lstm_tpu.data.dropbear import preprocess_raw
        from svd_lstm_tpu.data.synthetic import synthetic_dropbear_raw

        ds = preprocess_raw(
            synthetic_dropbear_raw(duration=12.0),
            dataclasses.replace(dcfg, split_time=8.0),
        )
        tcfg = TrainConfig(num_windows=2048, window_len=100, epochs=6, batch_size=64)
    else:
        ds = preprocess(dcfg)
        tcfg = TrainConfig(epochs=args.epochs)

    print(f"devices: {jax.devices()}", flush=True)
    if os.path.exists(args.ckpt) and not args.quick:
        model = load_params(args.ckpt)
        print(f"loaded {args.ckpt}")
    else:
        print(f"training 4x30 model ({tcfg.epochs} epochs, "
              f"{args.pipeline} pipeline)...", flush=True)
        model = fit(
            st.init_stacked_lstm(jax.random.PRNGKey(0), input_dim, UNITS),
            ds.X_train, ds.y_train, tcfg, verbose=True,
        ).params
        if not args.quick:
            save_params(args.ckpt, model)

    inv = lambda v: ds.pin_scaler.inverse_transform(
        np.asarray(v).reshape(-1, 1)
    ).ravel()
    y_true = inv(ds.y_test)

    rmses = []
    for k in KS:
        r = UNITS[0] - k
        m_k = model
        for layer in REDUCED_LAYERS:
            for mat in (0, 1):            # W, U
                for gate in range(4):     # i, f, c, o
                    m_k = set_model_matrix_rank(m_k, (layer, mat, gate), r)
        pred = inv(predict_full_run(m_k, ds.X_test))
        e = rmse(y_true, pred)
        rmses.append(e)
        print(f"k={k:2d} (r={r:2d}): RMSE {e*1000:.3f} mm  ratio {e/rmses[0]:.4f}",
              flush=True)

    ratio = [e / rmses[0] for e in rmses]
    flat_max = max(ratio[: 16])
    print(f"\nflat region k=0..15: max ratio {flat_max:.4f}  "
          f"(published: ~1.00 flat to k=15)")
    print(f"divergence: ratio[17]={ratio[17]:.3f} ratio[19]={ratio[19]:.3f}  "
          f"(published: ~1.1 at 17, >2 by 19)")

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(
            {
                "config": {
                    "units": UNITS,
                    "reduced_layers_0based": REDUCED_LAYERS,
                    "k_range": KS,
                    "protocol": "set_model_matrix_rank over all W/U gates "
                    "of cells 2-3 (slide 13 / old_versions/svd_acceleration.py)",
                    "pipeline": args.pipeline,
                    "dataset": "synthetic DROPBEAR surrogate"
                    + (" (quick)" if args.quick else ""),
                    "epochs": tcfg.epochs,
                },
                "rmse_m": rmses,
                "ratio": ratio,
            },
            f,
            indent=1,
        )
    print(f"wrote {args.out}")

    from svd_lstm_tpu.viz.plots import plot_rmse_curve

    # published axes: x = n−r ticks 0..19, ylim (0.8, 2.0)
    plot_rmse_curve(KS, ratio, xlabel="n - r", savepath=args.plot, ylim=(0.8, 2.0))
    print(f"wrote {args.plot}")

    if not args.quick and args.pipeline == "v1":
        assert flat_max < 1.15, f"flat region violated: {flat_max}"
        assert ratio[19] > ratio[15] + 0.25, "no divergence at k=19"
        print("PUBLISHED-CONFIG PROPERTY HOLDS: flat to k=15, divergent beyond")


if __name__ == "__main__":
    main()
