"""Multi-head attention with PyTorch-``nn.MultiheadAttention`` parity.

This is the single highest-leverage parity surface in the framework
(SURVEY.md §7 step 2): every block in the reference model zoo is built on
``nn.MultiheadAttention(batch_first=True)``. We reproduce:

  * packed ``in_proj_weight [3d, d]`` / ``in_proj_bias [3d]`` parameter
    layout (so torch checkpoints import without splitting/renaming),
  * ``key_padding_mask`` semantics (True = PAD, additive -inf bias),
  * attention-probability dropout (applied to the softmax output, only in
    training),
  * **head-averaged** attention-weight export: when weights are requested,
    the returned map is averaged over heads — ``[B, Lq, Lk]`` — matching
    torch's ``average_attn_weights=True`` default, which is what the
    reference's interpretability dumps contain
    (reference: scripts/infer/mosei_eval_infer.py:221).

Compute routing: the einsum path below is what XLA sees by default; when
``hriemo.ops.flash_attention`` is usable (TPU, no weight export) the fused
Pallas kernel takes over. Both paths share this parameter layout.

Exported weights are the *pre-dropout* probabilities — identical to torch
in eval mode, which is the only mode the reference exports attention in.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..core.masking import mask_to_bias
from . import initializers as init
from .layers import dropout as _dropout, linear_apply
from .module import Module


def mha_init(key, d_model: int, bias: bool = True):
    k_in, k_out = jax.random.split(key)
    p = {
        "in_proj_weight": init.xavier_uniform(k_in, (3 * d_model, d_model)),
        "out_proj": {
            "weight": init.kaiming_uniform_linear(k_out, d_model, d_model),
        },
    }
    if bias:
        p["in_proj_bias"] = init.zeros((3 * d_model,))
        p["out_proj"]["bias"] = init.zeros((d_model,))
    return p


def _split_heads(x: jnp.ndarray, n_heads: int) -> jnp.ndarray:
    b, l, d = x.shape
    return x.reshape(b, l, n_heads, d // n_heads).transpose(0, 2, 1, 3)


def _merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    b, h, l, hd = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, l, h * hd)


def mha_apply(
    params,
    query: jnp.ndarray,
    key: jnp.ndarray,
    value: jnp.ndarray,
    n_heads: int,
    key_padding_mask: jnp.ndarray | None = None,
    need_weights: bool = False,
    dropout_rate: float = 0.0,
    dropout_key=None,
    train: bool = False,
    use_kernel: bool | None = None,
):
    """Returns ``(out [B,Lq,d], weights [B,Lq,Lk] | None)``.

    ``use_kernel=None`` auto-routes to the Pallas flash kernel when legal
    (TPU backend, no weight export, no attention dropout).
    """
    d_model = query.shape[-1]
    head_dim = d_model // n_heads
    assert head_dim * n_heads == d_model, "d_model must divide n_heads"

    if "in_proj_w_int8" in params and key is value and not need_weights \
            and not (train and dropout_rate > 0.0) and use_kernel is not False:
        # use_kernel=False must force the einsum reference path even on a
        # quantized tree — it is the debug/numerics escape hatch (advisor
        # finding, round 2)
        from ..ops.attention_block import mha_block_int8, use_mha_block

        if use_mha_block(params, query.shape[1], key.shape[1], d_model,
                         n_heads):
            # fused int8 sublayer: projections + attention + out-proj in
            # one Pallas pass (measured rationale in ops/attention_block)
            out = mha_block_int8(params, query, key, key_padding_mask,
                                 n_heads)
            return out, None

    b = params.get("in_proj_bias")
    if "in_proj_w_int8" in params:
        # int8 serving: the packed [3d, d] weight carries per-output-row
        # scales, so each q/k/v slice is a valid int8 Linear on its own
        # (ops.quant.quantize_tree_for_serving rewrites MHA dicts)
        from ..ops.quant import int8_linear

        wq8, ws = params["in_proj_w_int8"], params["in_proj_w_scale"]
        sl = lambda i: {"w_int8": wq8[i * d_model:(i + 1) * d_model],
                        "w_scale": ws[i * d_model:(i + 1) * d_model]}
        q = int8_linear(sl(0), query)
        k = int8_linear(sl(1), key)
        v = int8_linear(sl(2), value)
    else:
        w = params["in_proj_weight"]
        w_q, w_k, w_v = w[:d_model], w[d_model : 2 * d_model], w[2 * d_model :]
        q = jnp.matmul(query, w_q.T)
        k = jnp.matmul(key, w_k.T)
        v = jnp.matmul(value, w_v.T)
    if b is not None:
        q = q + b[:d_model]
        k = k + b[d_model : 2 * d_model]
        v = v + b[2 * d_model :]

    q = _split_heads(q, n_heads)  # [B, H, Lq, hd]
    k = _split_heads(k, n_heads)  # [B, H, Lk, hd]
    v = _split_heads(v, n_heads)

    attn_dropout_active = train and dropout_rate > 0.0
    weights = None

    if use_kernel is None:
        use_kernel = (
            not need_weights
            and not attn_dropout_active
            and _kernel_available()
        )
    elif use_kernel and (need_weights or attn_dropout_active):
        # the fused kernel never materialises probabilities, so it cannot
        # export weights nor apply attention dropout — forcing it in these
        # modes would silently drop both (review finding)
        raise ValueError(
            "use_kernel=True is incompatible with need_weights=True or "
            "train-mode attention dropout")

    if use_kernel:
        from ..ops.flash_attention import flash_mha

        out = flash_mha(q, k, v, key_padding_mask)
    else:
        scale = 1.0 / math.sqrt(head_dim)
        scores = jnp.einsum(
            "bhqd,bhkd->bhqk", q * scale, k, preferred_element_type=jnp.float32
        )
        bias = mask_to_bias(key_padding_mask, scores.dtype)
        if bias is not None:
            scores = scores + bias
        probs = jax.nn.softmax(scores, axis=-1)
        if need_weights:
            # Head-averaged, pre-dropout — torch average_attn_weights=True.
            weights = jnp.mean(probs, axis=1).astype(query.dtype)
        probs = probs.astype(query.dtype)
        if attn_dropout_active:
            probs = _dropout(probs, dropout_rate, dropout_key, train)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)

    out = _merge_heads(out)
    # linear_apply so a quantized tree (ops.quant) dispatches to int8
    # (the packed in_proj dispatches above via in_proj_w_int8)
    out = linear_apply(params["out_proj"], out)
    return out, weights


def _kernel_available() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


class MultiheadAttention(Module):
    """Stateful convenience wrapper (torch-like call signature)."""

    def __init__(self, d_model: int, n_heads: int, dropout: float = 0.0, seed: int = 0):
        self.d_model = d_model
        self.n_heads = n_heads
        self.dropout_rate = dropout
        self.seed = seed

    def init(self, key):
        return mha_init(key, self.d_model)

    def apply(
        self,
        params,
        query,
        key,
        value,
        key_padding_mask=None,
        need_weights: bool = False,
        dropout_key=None,
        train: bool = False,
    ):
        return mha_apply(
            params,
            query,
            key,
            value,
            self.n_heads,
            key_padding_mask=key_padding_mask,
            need_weights=need_weights,
            dropout_rate=self.dropout_rate,
            dropout_key=dropout_key,
            train=train,
        )
