from .module import Module, flatten_params, unflatten_params, split_keys
from .layers import (
    Linear,
    LayerNorm,
    linear_init,
    linear_apply,
    layer_norm_init,
    layer_norm_apply,
    mlp2_init,
    mlp2_apply,
    dropout,
    relu,
)
from .attention import MultiheadAttention, mha_init, mha_apply

__all__ = [
    "Module",
    "flatten_params",
    "unflatten_params",
    "split_keys",
    "Linear",
    "LayerNorm",
    "linear_init",
    "linear_apply",
    "layer_norm_init",
    "layer_norm_apply",
    "mlp2_init",
    "mlp2_apply",
    "dropout",
    "relu",
    "MultiheadAttention",
    "mha_init",
    "mha_apply",
]
