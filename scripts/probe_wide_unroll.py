"""A/B: lax.scan over stacked layer weights vs a Python-unrolled layer
loop for the wide fused train path (3x512/B=128/T=200)."""
import numpy as np, jax, jax.numpy as jnp, optax
from svd_lstm_tpu.bench.devtime import device_time_ms
from svd_lstm_tpu.models.lstm import init_stacked_lstm
from svd_lstm_tpu.ops.pallas_train import stacked_lstm_apply_fast_train
from svd_lstm_tpu.ops.pallas_train_wide import wide_layer_trainable

F32 = jnp.float32
T, B, d, n = 200, 128, 16, 512
rng = np.random.default_rng(0)
params = init_stacked_lstm(jax.random.PRNGKey(0), d, (n, n, n))
x = jnp.asarray(rng.normal(size=(B, T, d)), F32)
y = jnp.asarray(rng.normal(size=(B,)), F32)

def apply_unrolled(p, xx, return_sequences=True):
    h = jnp.swapaxes(xx, 0, 1)
    T_, B_, d_ = h.shape
    W1 = p.layers[0].W
    if d_ < n:
        W1 = jnp.concatenate([W1, jnp.zeros((n - d_, 4 * n), W1.dtype)], axis=0)
        h = jnp.concatenate([h, jnp.zeros((T_, B_, n - d_), h.dtype)], axis=-1)
    Ws = [W1] + [l.W for l in p.layers[1:]]
    for W, l in zip(Ws, p.layers):
        h = wide_layer_trainable(h, W, l.U, l.b)
    if not return_sequences:
        return h[-1] @ p.head.w + p.head.b
    return jnp.swapaxes(h @ p.head.w + p.head.b, 0, 1)

def mk_step(apply_fn):
    def loss(p, xx, yy):
        pred = apply_fn(p, xx, return_sequences=False)[..., 0]
        return jnp.mean((pred - yy) ** 2)
    opt = optax.adam(1e-3)
    s0 = opt.init(params)
    @jax.jit
    def step(p, s, xx, yy):
        l, g = jax.value_and_grad(loss)(p, xx, yy)
        u, s = opt.update(g, s, p)
        return optax.apply_updates(p, u), s, l
    return step, s0

# parity first
g1 = jax.jit(jax.grad(lambda p: jnp.sum(stacked_lstm_apply_fast_train(p, x, return_sequences=False)**2)))(params)
g2 = jax.jit(jax.grad(lambda p: jnp.sum(apply_unrolled(p, x, return_sequences=False)**2)))(params)
rel = max(float(jnp.abs(a-b).max()/(jnp.abs(a).max()+1e-9)) for a,b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)))
print("grad parity scan-vs-unrolled max rel:", rel)

s_scan, s0a = mk_step(stacked_lstm_apply_fast_train)
s_unr, s0b = mk_step(apply_unrolled)
jax.block_until_ready(s_scan(params, s0a, x, y)); jax.block_until_ready(s_unr(params, s0b, x, y))
print("scan-over-layers step:", device_time_ms(s_scan, params, s0a, x, y))
print("unrolled step:       ", device_time_ms(s_unr, params, s0b, x, y))
