"""Device-time study: full vs reduced across impls/ranks/sizes on real TPU."""
import sys
import numpy as np
import jax
import jax.numpy as jnp

import svd_lstm_tpu as st
from svd_lstm_tpu.bench.devtime import device_time_ms
from svd_lstm_tpu.bench.timing import time_full_vs_reduced
from svd_lstm_tpu.models.lstm import init_stacked_lstm, stacked_lstm_apply
from svd_lstm_tpu.models.reduced import reduced_lstm_apply
from svd_lstm_tpu.ops import pallas_lstm as pk

T = 6656
rng = np.random.default_rng(0)

for units, d, ranks in [((40, 40, 40, 40), 16, (10, 20, 30)),
                        ((128, 128, 128, 128), 16, (16, 32, 64))]:
    n = units[0]
    x = rng.normal(size=(T, d)).astype(np.float32)
    params = init_stacked_lstm(jax.random.PRNGKey(0), d, units)
    print(f"--- model {len(units)}x{n}, d={d}, T={T}", flush=True)
    for merged in (False, True):
        smodel = st.make_singular_model(params, merged_kernel=merged)
        for r in ranks:
            rmodel = st.make_reduced_model(smodel, rank=r)
            for impl in ("scan", "pallas", "hybrid"):
                try:
                    res = time_full_vs_reduced(params, rmodel, x, impl=impl, repeats=2)
                    print(f"merged={merged} r={r:3d} {impl:7s} "
                          f"full {res.full_ms:8.3f} ms  red {res.reduced_ms:8.3f} ms  "
                          f"ratio {res.ratio:.3f}", flush=True)
                except Exception as e:
                    print(f"merged={merged} r={r:3d} {impl:7s} FAILED {type(e).__name__}: {str(e)[:90]}", flush=True)
        # full model only needs timing once per impl really; keep output simple
        break  # merged=False (driver default) only for the main table; merged below
