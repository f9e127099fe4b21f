"""Rank-reduction sweep: RMSE-vs-rank curve + prediction GIF.

Workflow parity with reference code/old_versions/svd_acceleration.py:
sort all per-gate singular values ascending (first-layer W protected),
iteratively truncate, evaluate whole-run RMSE, emit RMSE_plot.png and
reduce_rank.gif.

Usage:
    python examples/rank_sweep.py [--quick] [--ckpt PATH]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--ckpt", default="./model_saves/pretrained_sequential.npz")
    ap.add_argument("--plots", default="./plots")
    ap.add_argument("--evaluate-every", type=int, default=8)
    ap.add_argument("--max-reductions", type=int, default=None)
    args = ap.parse_args()

    import jax

    import svd_lstm_tpu as st
    from svd_lstm_tpu.bench.sweep import rank_sweep
    from svd_lstm_tpu.config import DataConfig, SweepConfig, TrainConfig
    from svd_lstm_tpu.data import preprocess
    from svd_lstm_tpu.io.checkpoint import load_params
    from svd_lstm_tpu.train.loop import fit
    from svd_lstm_tpu.viz.plots import plot_rmse_curve, save_prediction_gif

    if args.quick:
        from svd_lstm_tpu.data.dropbear import preprocess_raw
        from svd_lstm_tpu.data.synthetic import synthetic_dropbear_raw

        ds = preprocess_raw(synthetic_dropbear_raw(duration=10.0), DataConfig(split_time=6.0))
        units = (40, 40)
        max_red = args.max_reductions or 128
    else:
        ds = preprocess(DataConfig())
        units = (40, 40, 40, 40)
        max_red = args.max_reductions

    if os.path.exists(args.ckpt):
        model = load_params(args.ckpt)
    else:
        print("no checkpoint — training briefly")
        model = fit(
            st.init_stacked_lstm(jax.random.PRNGKey(0), 16, units),
            ds.X_train, ds.y_train,
            TrainConfig(num_windows=2048, window_len=100, epochs=3, batch_size=64),
            verbose=True,
        ).params

    y_m = ds.pin_scaler.inverse_transform(ds.y_test.reshape(-1, 1)).ravel()
    res = rank_sweep(
        model, ds.X_test, y_m, ds.pin_scaler.inverse_transform,
        SweepConfig(evaluate_every=args.evaluate_every),
        max_reductions=max_red, keep_predictions=True,
    )
    print(f"{res.reductions_done} reductions; RMSE {res.rmse[0]:.5f} -> {res.rmse[-1]:.5f} m")

    plot_rmse_curve(
        res.weights_eliminated, res.rmse_ratio,
        xlabel="weights eliminated",
        savepath=os.path.join(args.plots, "RMSE_plot.png"),
    )
    try:
        save_prediction_gif(
            ds.t_test, y_m, res.predictions,
            os.path.join(args.plots, "reduce_rank.gif"),
            labels=[f"eliminated = {int(w)}" for w in res.weights_eliminated],
        )
        print("wrote RMSE_plot.png and reduce_rank.gif")
    except RuntimeError as e:
        print(f"gif skipped: {e}")


if __name__ == "__main__":
    main()
