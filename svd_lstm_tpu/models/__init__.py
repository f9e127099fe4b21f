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
from svd_lstm_tpu.models.conv import (
    ConvLSTMParams,
    ConvSingularParams,
    ConvReducedParams,
    init_conv_lstm,
    conv_lstm_apply,
    conv_singular_apply,
    conv_reduced_apply,
)
from svd_lstm_tpu.models.streaming import (
    init_stream,
    make_stream_fn,
    stream_many,
    stream_step,
)
