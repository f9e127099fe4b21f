from svd_lstm_tpu.parallel.mesh import make_mesh
from svd_lstm_tpu.parallel.train import (
    make_sharded_train_step,
    make_batched_inference,
    make_batched_fast_inference,
    shard_params_for_mesh,
    shard_layer_tp,
)
