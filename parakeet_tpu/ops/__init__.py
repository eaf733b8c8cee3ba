from parakeet_tpu.ops.layers import (
    batch_norm_1d,
    conv1d,
    conv2d,
    embedding,
    glu,
    layer_norm,
    linear,
)
from parakeet_tpu.ops.lstm import lstm_step, lstm_zero_state

__all__ = [
    "linear",
    "conv1d",
    "conv2d",
    "layer_norm",
    "batch_norm_1d",
    "embedding",
    "glu",
    "lstm_step",
    "lstm_zero_state",
]
