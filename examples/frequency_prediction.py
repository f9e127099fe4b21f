"""Toy sine-series task: predict period / amplitude / frequency.

Parity with reference code/old_versions/frequency-prediction-lstm.py:
2×20-unit stacked LSTM on generated sine series, scatter plot of predicted
vs true values.

Usage:
    python examples/frequency_prediction.py [--y-type frequency|period|amplitude]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--y-type", default="frequency",
                    choices=["frequency", "period", "amplitude"])
    ap.add_argument("--epochs", type=int, default=5)
    ap.add_argument("--plots", default="./plots")
    ap.add_argument("--quick", action="store_true", help="1-epoch CPU smoke run")
    args = ap.parse_args()
    if args.quick:
        args.epochs = 1

    import jax
    import jax.numpy as jnp
    import optax

    import svd_lstm_tpu as st
    from svd_lstm_tpu.data.synthetic import generate_time_series
    from svd_lstm_tpu.models.lstm import stacked_lstm_apply

    X, y = generate_time_series(10000, 76, y_type=args.y_type, seed=42)
    X_train, y_train = X[:7000], y[:7000]
    X_test, y_test = X[7000:], y[7000:]

    params = st.init_stacked_lstm(jax.random.PRNGKey(0), 1, (20, 20))
    opt = optax.adam(1e-3)
    state = opt.init(params)

    @jax.jit
    def step(p, s, xb, yb):
        def loss(p):
            pred = stacked_lstm_apply(p, xb, return_sequences=False)[..., 0]
            return jnp.mean((pred - yb) ** 2)

        l, g = jax.value_and_grad(loss)(p)
        u, s = opt.update(g, s, p)
        return optax.apply_updates(p, u), s, l

    bs = 128
    for epoch in range(args.epochs):
        losses = []
        for i in range(0, len(X_train) - bs + 1, bs):
            params, state, l = step(
                params, state, jnp.asarray(X_train[i : i + bs]), jnp.asarray(y_train[i : i + bs])
            )
            losses.append(float(l))
        print(f"epoch {epoch}: loss {np.mean(losses):.5f}")

    pred = np.asarray(
        jax.jit(lambda p, x: stacked_lstm_apply(p, x, return_sequences=False))(
            params, jnp.asarray(X_test)
        )
    )[:, 0]
    rmse = st.rmse(y_test, pred)
    print(f"test RMSE: {rmse:.5f}")

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    plt.figure(figsize=(4, 3.4))
    plt.scatter(y_test, pred, s=2, label="Test Data")
    lo, hi = float(min(y_test.min(), pred.min())), float(max(y_test.max(), pred.max()))
    plt.plot([lo, hi], [lo, hi], c="k", label="y=x")
    plt.legend()
    plt.title(f"LSTM model predicts {args.y_type}")
    plt.xlabel(f"true {args.y_type}")
    plt.ylabel(f"predicted {args.y_type}")
    plt.tight_layout()
    os.makedirs(args.plots, exist_ok=True)
    out = os.path.join(args.plots, f"predicting_{args.y_type}.png")
    plt.savefig(out, dpi=300)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
