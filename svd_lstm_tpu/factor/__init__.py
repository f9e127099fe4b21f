from svd_lstm_tpu.factor.svd import (
    factorize_lstm_params,
    make_singular_model,
    make_reduced_model,
    make_conv_singular_model,
    make_conv_reduced_model,
    conv_singular_to_dense,
    singular_to_dense,
    truncate_singular_layer,
    reduce_matrix_rank,
    reduce_two_step,
    two_step_factors,
    get_model_singular_values,
    set_model_matrix_rank,
)
from svd_lstm_tpu.factor.regularizers import (
    hoyer_penalty,
    orthogonal_penalty,
    trace_norm_penalty,
)
from svd_lstm_tpu.factor.prune_magnitude import (
    PolynomialDecaySchedule,
    finetune_with_pruning,
    magnitude_mask,
    prune_sigmas,
    sigma_sparsity,
)
