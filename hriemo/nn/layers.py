"""Parameterised primitive layers (torch-layout params, pure-functional apply)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import initializers as init
from .module import Module, split_keys


def linear_init(key, in_features: int, out_features: int, bias: bool = True):
    kw, kb = jax.random.split(key)
    p = {"weight": init.kaiming_uniform_linear(kw, out_features, in_features)}
    if bias:
        p["bias"] = init.linear_bias(kb, out_features, in_features)
    return p


def linear_apply(p, x):
    """x @ W^T + b with torch-layout W [out, in].

    The transpose is a dot_general dimension-number choice for XLA, not a
    data movement; keeping torch layout makes checkpoint import a no-op.

    Dispatches on the param dict: a tree pre-quantized with
    ``hriemo.ops.quant.quantize_tree_for_serving`` carries ``w_int8``
    instead of ``weight`` and routes to the int8 MXU path — model forward
    code is precision-agnostic, exactly like the bf16 tree_map cast.
    """
    if "w_int8" in p:
        from ..ops.quant import int8_linear

        return int8_linear(p, x)
    y = jnp.matmul(x, p["weight"].T)
    if "bias" in p:
        y = y + p["bias"]
    return y


def layer_norm_init(d: int):
    return {"weight": init.ones((d,)), "bias": init.zeros((d,))}


def layer_norm_apply(p, x, eps: float = 1e-5):
    # fp32 statistics regardless of compute dtype (bf16-safe).
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    normed = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (normed * p["weight"] + p["bias"]).astype(x.dtype)


def dropout(x, rate: float, key, train: bool):
    """Inverted dropout matching torch semantics; identity when not training.

    A training call with a positive rate MUST supply a key — silently
    skipping dropout would diverge from the reference recipe with no
    warning (review finding).
    """
    if not train or rate == 0.0:
        return x
    if key is None:
        raise ValueError(
            "dropout: train=True with rate>0 requires an rng key — pass "
            "rng=... to apply() (or train=False for deterministic eval)")
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


def relu(x):
    return jnp.maximum(x, 0)


def mlp2_init(key, d_in: int, d_hidden: int, d_out: int):
    """Params for torch ``nn.Sequential(Linear, ReLU, Linear)``.

    Keys are "0" and "2" so the flattened names match torch state_dict
    entries like ``mlp.0.weight`` / ``mlp.2.weight`` exactly.
    """
    k0, k2 = jax.random.split(key)
    return {
        "0": linear_init(k0, d_in, d_hidden),
        "2": linear_init(k2, d_hidden, d_out),
    }


def mlp2_apply(p, x):
    if "w_int8" in p["0"]:
        from ..ops.fused_ffn import mlp2_int8, use_mlp2_int8

        if use_mlp2_int8(p["0"], p["2"]):
            # fused W8A8 pair — the int8 win only materialises inside a
            # kernel (ops/fused_ffn.py measured routing table)
            return mlp2_int8(p["0"], p["2"], x)
    return linear_apply(p["2"], relu(linear_apply(p["0"], x)))


class Linear(Module):
    def __init__(self, in_features: int, out_features: int, bias: bool = True, seed: int = 0):
        self.in_features = in_features
        self.out_features = out_features
        self.bias = bias
        self.seed = seed

    def init(self, key):
        return linear_init(key, self.in_features, self.out_features, self.bias)

    def apply(self, params, x):
        return linear_apply(params, x)


class LayerNorm(Module):
    def __init__(self, d: int, eps: float = 1e-5, seed: int = 0):
        self.d = d
        self.eps = eps
        self.seed = seed

    def init(self, key):
        return layer_norm_init(self.d)

    def apply(self, params, x):
        return layer_norm_apply(params, x, self.eps)
