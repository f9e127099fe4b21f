from svd_lstm_tpu.train.metrics import rmse, nrmse, signaltonoise
