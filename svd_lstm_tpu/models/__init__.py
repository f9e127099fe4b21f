from svd_lstm_tpu.models.lstm import (
    LSTMLayerParams,
    DenseParams,
    StackedLSTMParams,
    init_stacked_lstm,
    lstm_layer_apply,
    stacked_lstm_apply,
    lstm_cell_step,
)
from svd_lstm_tpu.models.singular import SingularLayerParams, singular_lstm_apply
from svd_lstm_tpu.models.reduced import ReducedLayerParams, reduced_lstm_apply
from svd_lstm_tpu.models.streaming import (
    init_stream,
    make_stream_fn,
    stream_many,
    stream_step,
)
