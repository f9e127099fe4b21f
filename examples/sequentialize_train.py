"""v1 workflow parity: train two toy LSTMs on different targets, splice
them into one wider stacked model, and keep training.

Reference: code/old_versions/train_full_model.py:42-190 trains 'frequency'
and 'amplitude' toy models, merges them with
sequentialize.merge_parallel_cell_weights, then continues training the
merged sequential model with SGD(momentum, clipvalue) + best-checkpointing.

Usage:
    python examples/sequentialize_train.py [--epochs N]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--out", default="./model_saves")
    ap.add_argument("--quick", action="store_true", help="1-epoch CPU smoke run")
    args = ap.parse_args()
    if args.quick:
        args.epochs = 1

    import jax
    import jax.numpy as jnp
    import optax

    import svd_lstm_tpu as st
    from svd_lstm_tpu.data.synthetic import generate_time_series
    from svd_lstm_tpu.models.lstm import (
        DenseParams,
        StackedLSTMParams,
        init_stacked_lstm,
        stacked_lstm_apply,
        _glorot_uniform,
    )
    from svd_lstm_tpu.models.merge import merge_parallel_cell_weights
    from svd_lstm_tpu.io.checkpoint import save_params

    def run_epochs(params, opt, X, y, tag, epochs):
        """Shared minibatch trainer for both phases (toy pre-trains and the
        merged continuation) — only the optimizer and data differ."""
        state = opt.init(params)

        @jax.jit
        def step(p, s, xb, yb):
            def loss(p):
                pred = stacked_lstm_apply(p, xb, return_sequences=False)[..., 0]
                return jnp.mean((pred - yb) ** 2)

            l, g = jax.value_and_grad(loss)(p)
            u, s = opt.update(g, s, p)
            return optax.apply_updates(p, u), s, l

        for ep in range(epochs):
            losses = []
            for i in range(0, 4096 - 127, 128):
                params, state, l = step(
                    params, state, jnp.asarray(X[i : i + 128]), jnp.asarray(y[i : i + 128])
                )
                losses.append(float(l))
            print(f"  [{tag}] epoch {ep}: loss {np.mean(losses):.5f}")
        return params

    def train_toy(y_type, units, seed, epochs):
        X, y = generate_time_series(4096, 60, y_type=y_type, seed=seed)
        params = init_stacked_lstm(jax.random.PRNGKey(seed), 1, units)
        return run_epochs(params, optax.adam(2e-3), X, y, y_type, epochs)

    print("training toy models (frequency, amplitude)...")
    freq = train_toy("frequency", (20, 20), seed=0, epochs=args.epochs)
    ampl = train_toy("amplitude", (10, 10), seed=1, epochs=args.epochs)

    print("splicing into one 30-unit stacked model...")
    l0 = merge_parallel_cell_weights(freq.layers[0], ampl.layers[0], same_x=True)
    l1 = merge_parallel_cell_weights(freq.layers[1], ampl.layers[1], same_x=False)
    head = DenseParams(
        w=_glorot_uniform(jax.random.PRNGKey(9), (30, 1), jnp.float32),
        b=jnp.zeros((1,), jnp.float32),
    )
    merged = StackedLSTMParams(layers=(l0, l1), head=head)

    # continue training the merged model on the frequency target with the
    # v1-style optimizer: SGD(momentum=.9, clipvalue=.5) — reference
    # old_versions/train_full_model.py:116
    X, yf = generate_time_series(4096, 60, y_type="frequency", seed=7)
    opt = optax.chain(optax.clip(0.5), optax.sgd(1e-2, momentum=0.9))
    print("continuing training on the merged model...")
    params = run_epochs(merged, opt, X, yf, "merged", args.epochs)

    # keep the smoke artifact separate from the committed full-run one
    name = (
        "pretrained_split_merged_quick.npz" if args.quick
        else "pretrained_split_merged.npz"
    )
    save_params(os.path.join(args.out, name), params)
    print(f"saved to {args.out}/{name}")


if __name__ == "__main__":
    main()
