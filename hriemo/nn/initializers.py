"""Weight initializers reproducing torch defaults.

These matter for training-from-scratch parity: the reference relies on
``nn.Linear`` / ``nn.MultiheadAttention`` / ``nn.LayerNorm`` default
initialisation everywhere (no custom init in the reference model zoo).

torch defaults reproduced here:
  * ``nn.Linear.weight``  : kaiming_uniform(a=sqrt(5))  == U(-1/sqrt(fan_in), 1/sqrt(fan_in))
  * ``nn.Linear.bias``    : U(-1/sqrt(fan_in), 1/sqrt(fan_in))
  * ``nn.MultiheadAttention.in_proj_weight`` : xavier_uniform
  * ``nn.MultiheadAttention`` biases         : zeros
  * ``nn.LayerNorm``      : weight=1, bias=0
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def kaiming_uniform_linear(key, out_features: int, in_features: int, dtype=jnp.float32):
    """torch ``nn.Linear`` default weight init; returns [out, in] (torch layout)."""
    bound = 1.0 / math.sqrt(in_features)
    return jax.random.uniform(
        key, (out_features, in_features), dtype, minval=-bound, maxval=bound
    )


def linear_bias(key, out_features: int, in_features: int, dtype=jnp.float32):
    bound = 1.0 / math.sqrt(in_features)
    return jax.random.uniform(key, (out_features,), dtype, minval=-bound, maxval=bound)


def xavier_uniform(key, shape, dtype=jnp.float32):
    """torch ``xavier_uniform_`` for 2D [fan_out, fan_in] tensors."""
    fan_out, fan_in = shape
    bound = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def normal(key, shape, dtype=jnp.float32):
    return jax.random.normal(key, shape, dtype)


def zeros(shape, dtype=jnp.float32):
    return jnp.zeros(shape, dtype)


def ones(shape, dtype=jnp.float32):
    return jnp.ones(shape, dtype)
