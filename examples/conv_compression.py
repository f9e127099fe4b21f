"""Conv-hybrid compression workflow: train → factorize → fine-tune →
truncate → deploy.

The reference's convolutional experiment
(code/old_versions/toy-convolution.py:70-76: Conv1D(15, 10, causal, relu) +
2×15 LSTM + TimeDistributed Dense(1) on DROPBEAR) never met its compression
pipeline (code/svd_acceleration_v3.py). This example closes that square
with the rebuilt framework: the hybrid goes through the identical
dense→singular→reduced surgery, σ-only Hoyer fine-tune, and every
deployment surface (streaming, CSV export, native C++ consumer).

Usage:
    python examples/conv_compression.py [--quick] [--rank R]

--quick shrinks everything for a CPU smoke run (also used by CI).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--rank", type=int, default=8,
                    help="two-step rank per gate block after fine-tuning")
    ap.add_argument("--out", default="./model_saves")
    ap.add_argument("--hoyer", type=float, default=0.01)
    ap.add_argument(
        "--recover-epochs", type=int, default=0,
        help="post-truncation recovery fine-tune: retrain the two-step "
        "factors directly for N epochs (train/finetune.finetune_reduced — "
        "beyond-reference: the reference's reduced cell is frozen)",
    )
    args = ap.parse_args()

    import jax

    import svd_lstm_tpu as st
    from svd_lstm_tpu.config import DataConfig, FactorConfig, TrainConfig
    from svd_lstm_tpu.models.conv import (
        conv_lstm_apply,
        conv_reduced_apply,
        conv_singular_apply,
        init_conv_lstm,
    )
    from svd_lstm_tpu.train.finetune import finetune, harvest_sigmas
    from svd_lstm_tpu.train.loop import fit, predict_full_run

    # -- data: the DROPBEAR pipeline (surrogate raw in --quick) ------------
    if args.quick:
        from svd_lstm_tpu.data.dropbear import preprocess_raw
        from svd_lstm_tpu.data.synthetic import synthetic_dropbear_raw

        ds = preprocess_raw(
            synthetic_dropbear_raw(duration=12.0), DataConfig(split_time=8.0)
        )
        tcfg = TrainConfig(num_windows=1024, window_len=100, epochs=3,
                           batch_size=64)
        ft_epochs = 2
    else:
        from svd_lstm_tpu.data import preprocess

        ds = preprocess(DataConfig())
        tcfg = TrainConfig(num_windows=20_000, window_len=200, epochs=20)
        ft_epochs = 10

    d_in = ds.X_train.shape[-1]

    # -- train the hybrid (reference architecture, 16-wide FFT features) ---
    params = init_conv_lstm(
        jax.random.PRNGKey(tcfg.seed),
        in_channels=d_in, filters=15, kernel_size=10, units=(15, 15),
    )
    t0 = time.perf_counter()
    res = fit(params, ds.X_train, ds.y_train, tcfg,
              apply_fn=conv_lstm_apply, verbose=True)
    print(f"hybrid training wall time: {time.perf_counter() - t0:.1f} s")
    dense = res.params

    def rmse_mm(pred):
        true_m = ds.pin_scaler.inverse_transform(ds.y.reshape(-1, 1)).ravel()
        pred_m = ds.pin_scaler.inverse_transform(pred.reshape(-1, 1)).ravel()
        return 1000.0 * st.rmse(true_m, pred_m)

    pred_dense = predict_full_run(dense, ds.X, apply_fn=conv_lstm_apply)
    n_dense = int(sum(x.size for x in jax.tree_util.tree_leaves(dense)))
    print(f"dense hybrid: RMSE {rmse_mm(pred_dense):.3f} mm, "
          f"{n_dense} weights")

    # -- factorize + sigma-only Hoyer fine-tune ----------------------------
    cs = st.make_conv_singular_model(dense)
    fres = finetune(
        cs, ds.X_train, ds.y_train,
        factor_cfg=FactorConfig(hoyer=args.hoyer),
        train_cfg=TrainConfig(num_windows=tcfg.num_windows,
                              window_len=tcfg.window_len,
                              batch_size=tcfg.batch_size, epochs=ft_epochs),
    )
    cs = fres.params
    pred_sing = predict_full_run(cs, ds.X, apply_fn=conv_singular_apply)
    sig = harvest_sigmas(cs)
    kill_frac = float(np.mean(np.abs(np.concatenate(
        [s.ravel() for pair in sig for s in pair])) < 0.05))
    print(f"fine-tuned singular: RMSE {rmse_mm(pred_sing):.3f} mm; "
          f"{100 * kill_frac:.0f}% of sigma below the 0.05 cutoff")

    # -- truncate to the exact two-step reduced hybrid ---------------------
    cr = st.make_conv_reduced_model(cs, cutoff=None, rank=args.rank)

    if args.recover_epochs:
        from svd_lstm_tpu.train.finetune import finetune_reduced

        pred_pre = predict_full_run(cr, ds.X, apply_fn=conv_reduced_apply)
        print(f"reduced pre-recovery: RMSE {rmse_mm(pred_pre):.3f} mm")
        rres = finetune_reduced(
            cr, ds.X_train, ds.y_train,
            train_cfg=TrainConfig(num_windows=tcfg.num_windows,
                                  window_len=tcfg.window_len,
                                  batch_size=tcfg.batch_size,
                                  epochs=args.recover_epochs),
        )
        cr = rres.params

    pred_red = predict_full_run(cr, ds.X, apply_fn=conv_reduced_apply)
    n_red = cr.weight_count()
    print(f"reduced hybrid (rank {args.rank}): RMSE {rmse_mm(pred_red):.3f} "
          f"mm, {n_red} weights ({100 * (1 - n_red / n_dense):.0f}% smaller)")

    # -- deployment: CSV export + native C++ consumer parity ---------------
    os.makedirs(args.out, exist_ok=True)
    export_dir = os.path.join(
        args.out, "conv_reduced_export_quick" if args.quick
        else "conv_reduced_export")
    from svd_lstm_tpu.io.native import NativeModel, save_reduced_weights_as_csv

    save_reduced_weights_as_csv(cr, export_dir)
    import subprocess

    try:
        nm = NativeModel.from_export_dir(export_dir)
    except (RuntimeError, OSError, subprocess.CalledProcessError) as e:
        print(f"native runtime unavailable ({e}); skipping consumer check")
    else:
        frames = np.asarray(ds.X[0, :256], np.float32)
        got = nm.run(frames)
        err = float(np.max(np.abs(got - pred_red[:256])))
        print(f"native consumer vs JAX over 256 frames: |delta| {err:.2e}")
        assert err < 5e-4, "native consumer diverged from the JAX forward"

    print("conv compression workflow OK")


if __name__ == "__main__":
    main()
