"""Backward batch-tile sweep for the fused wide-layer kernel (needs the
raised vmem limit for BT=128 at n=512)."""
import numpy as np, jax, jax.numpy as jnp, optax, sys
from svd_lstm_tpu.bench.devtime import device_time_ms
from svd_lstm_tpu.models.lstm import init_stacked_lstm
from svd_lstm_tpu.ops.pallas_train_wide import wide_layer_trainable

B, T, d, n, L = 128, 200, 16, 512, 3
rng = np.random.default_rng(0)
params = init_stacked_lstm(jax.random.PRNGKey(1), d, (n,) * L)
opt = optax.adam(1e-3)
s0 = opt.init(params)
x = jnp.asarray(rng.normal(size=(B, T, d)), jnp.float32)
y = jnp.asarray(rng.normal(size=(B,)), jnp.float32)

def mk_apply(bt_bwd):
    def apply_fn(p, xx, return_sequences=True):
        h = jnp.swapaxes(xx, 0, 1)
        Tn, Bn, dd = h.shape
        W1 = p.layers[0].W
        if dd < n:
            W1 = jnp.concatenate([W1, jnp.zeros((n - dd, 4 * n), W1.dtype)], axis=0)
            h = jnp.concatenate([h, jnp.zeros((Tn, Bn, n - dd), h.dtype)], axis=-1)
        Ws = jnp.stack([W1] + [l.W for l in p.layers[1:]])
        Us = jnp.stack([l.U for l in p.layers])
        bs = jnp.stack([l.b for l in p.layers])
        def body(hh, wub):
            W, U, b = wub
            return wide_layer_trainable(hh, W, U, b, bt_bwd=bt_bwd), 0.0
        h, _ = jax.lax.scan(body, h, (Ws, Us, bs))
        if not return_sequences:
            h = h[-1]
            return h @ p.head.w + p.head.b
        return jnp.swapaxes(h @ p.head.w + p.head.b, 0, 1)
    return apply_fn

for bt in [int(a) for a in sys.argv[1:]] or (64, 128):
    apply_fn = mk_apply(bt)
    def loss_fn(p, xx, yy):
        pred = apply_fn(p, xx, return_sequences=False)[..., 0]
        return jnp.mean((pred - yy) ** 2)
    @jax.jit
    def step(p, s, xx, yy):
        l, g = jax.value_and_grad(loss_fn)(p, xx, yy)
        u, s = opt.update(g, s, p)
        return optax.apply_updates(p, u), s, l
    try:
        jax.block_until_ready(step(params, s0, x, y))
        print(f"bt_bwd={bt}: {device_time_ms(step, params, s0, x, y):.3f} ms", flush=True)
    except Exception as e:
        print(f"bt_bwd={bt} FAIL {str(e)[:140]}", flush=True)
