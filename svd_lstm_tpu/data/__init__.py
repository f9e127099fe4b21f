from svd_lstm_tpu.data.scalers import StandardScaler
from svd_lstm_tpu.data.dropbear import preprocess, load_dropbear_json
from svd_lstm_tpu.data.batcher import split_train_random
from svd_lstm_tpu.data.synthetic import (
    generate_time_series,
    synthetic_dropbear_raw,
)
