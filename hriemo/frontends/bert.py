"""BERT text frontend in pure JAX.

Replaces the reference's per-utterance HF PyTorch BERT pass
(reference: scripts/iemocap_feature_extraction_seq_level/extract_text_feats_bert_seq.py)
with a batched XLA-compiled encoder. Parameter names mirror the HF
``BertModel`` state dict exactly (``embeddings.word_embeddings.weight``,
``encoder.layer.0.attention.self.query.weight``, …) so pretrained
checkpoints load with :meth:`BertEncoder.from_torch_state_dict`.

Architecture: standard post-norm BERT — embeddings (word + position +
token_type) → LN → N layers of (self-attention → add&LN → GELU FFN →
add&LN). Masking uses the framework's additive NEG_INF convention.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from ..core.masking import NEG_INF
from ..nn.layers import layer_norm_apply, linear_apply
from ..nn.module import Module


@dataclasses.dataclass
class BertConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    hidden_dropout_prob: float = 0.1
    # tanh-approximate GELU (see WavLMConfig.fast_gelu; default False = HF parity)
    fast_gelu: bool = False

    @classmethod
    def base_uncased(cls):
        return cls()

    @classmethod
    def tiny(cls, **kw):
        """Small config for tests."""
        d = dict(vocab_size=99, hidden_size=32, num_hidden_layers=2,
                 num_attention_heads=4, intermediate_size=64,
                 max_position_embeddings=64, type_vocab_size=2)
        d.update(kw)
        return cls(**d)


def _attention(p, x, bias, n_heads, eps):
    b, l, d = x.shape
    hd = d // n_heads

    sq = p["self"]
    if "w_int8" in sq["query"] and "w_int8" in p["output"]["dense"]:
        from ..ops.attention_block import mha_block_int8, use_mha_block

        # fused int8 sublayer: pack q/k/v into the kernel's in_proj form
        # (constant concats, hoisted by XLA). One Pallas pass replaces
        # projections + attention + output dense; residual+LN stay XLA
        # (one fused elementwise pass). Rationale: ops/attention_block.py.
        packed = {
            "in_proj_w_int8": jnp.concatenate(
                [sq[n]["w_int8"] for n in ("query", "key", "value")], 0),
            "in_proj_w_scale": jnp.concatenate(
                [sq[n]["w_scale"] for n in ("query", "key", "value")], 0),
            "out_proj": p["output"]["dense"],
        }
        if "bias" in sq["query"]:
            packed["in_proj_bias"] = jnp.concatenate(
                [sq[n]["bias"] for n in ("query", "key", "value")], 0)
        if use_mha_block(packed, l, l, d, n_heads):
            kpm = None if bias is None else (bias[:, 0, 0, :] < 0)
            out = mha_block_int8(packed, x, x, kpm, n_heads)
            return layer_norm_apply(p["output"]["LayerNorm"], x + out, eps)

    def proj(name):
        # per-projection dispatch (int8 when quantized); hand-packing the
        # three GEMMs was measured slower — see wavlm.py _attention note
        # (the mha_block route above is different: it fuses the WHOLE
        # sublayer, which is what removes the boundary costs)
        y = linear_apply(p["self"][name], x)
        return y.reshape(b, l, n_heads, hd).transpose(0, 2, 1, 3)

    q, k, v = proj("query"), proj("key"), proj("value")
    scores = jnp.einsum("bhqd,bhkd->bhqk", q / math.sqrt(hd), k,
                        preferred_element_type=jnp.float32)
    if bias is not None:
        scores = scores + bias
    probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
    ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(b, l, d)
    out = linear_apply(p["output"]["dense"], ctx)
    return layer_norm_apply(p["output"]["LayerNorm"], x + out, eps)


class BertEncoder(Module):
    """Returns ``(sequence_output [B,L,d], pooled [B,d])`` where pooled is
    the masked mean over tokens (the reference's pooling,
    extract_text_feats_bert_seq.py:62-76 / extract_text_feats_bert.py:73-83)."""

    def __init__(self, config: BertConfig | None = None, seed: int = 0):
        self.config = config or BertConfig()
        self.seed = seed

    def init(self, key):
        cfg = self.config
        d, ff = cfg.hidden_size, cfg.intermediate_size
        keys = iter(jax.random.split(key, 16 + 16 * cfg.num_hidden_layers))
        nrm = lambda: {"weight": jnp.ones((d,)), "bias": jnp.zeros((d,))}
        emb = lambda n, m: jax.random.normal(next(keys), (n, m)) * 0.02
        lin = lambda din, dout: {
            "weight": jax.random.normal(next(keys), (dout, din)) * 0.02,
            "bias": jnp.zeros((dout,)),
        }
        params = {
            "embeddings": {
                "word_embeddings": {"weight": emb(cfg.vocab_size, d)},
                "position_embeddings": {"weight": emb(cfg.max_position_embeddings, d)},
                "token_type_embeddings": {"weight": emb(cfg.type_vocab_size, d)},
                "LayerNorm": nrm(),
            },
            "encoder": {"layer": {}},
        }
        for i in range(cfg.num_hidden_layers):
            params["encoder"]["layer"][str(i)] = {
                "attention": {
                    "self": {"query": lin(d, d), "key": lin(d, d), "value": lin(d, d)},
                    "output": {"dense": lin(d, d), "LayerNorm": nrm()},
                },
                "intermediate": {"dense": lin(d, ff)},
                "output": {"dense": lin(ff, d), "LayerNorm": nrm()},
            }
        return params

    def apply(self, params, input_ids, attention_mask=None, token_type_ids=None):
        """input_ids [B,L] int; attention_mask [B,L] 1=valid (HF convention)."""
        cfg = self.config
        b, l = input_ids.shape
        if l > cfg.max_position_embeddings:
            # JAX gather would silently clamp to the last position embedding
            # where torch raises — fail loudly instead (review finding)
            raise ValueError(
                f"sequence length {l} exceeds max_position_embeddings "
                f"{cfg.max_position_embeddings}")
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        pos_ids = jnp.arange(l)[None, :]

        e = params["embeddings"]
        x = (e["word_embeddings"]["weight"][input_ids]
             + e["position_embeddings"]["weight"][pos_ids]
             + e["token_type_embeddings"]["weight"][token_type_ids])
        x = layer_norm_apply(e["LayerNorm"], x, cfg.layer_norm_eps)

        bias = None
        if attention_mask is not None:
            bias = jnp.where(attention_mask == 0, NEG_INF, 0.0).astype(jnp.float32)
            bias = bias[:, None, None, :]

        from ..ops.fused_ffn import route_ffn_block

        for i in range(cfg.num_hidden_layers):
            lp = params["encoder"]["layer"][str(i)]
            x = _attention(lp["attention"], x, bias, cfg.num_attention_heads,
                           cfg.layer_norm_eps)
            # post-norm FFN block; fused Pallas kernel when int8-quantized
            x = route_ffn_block(lp["intermediate"]["dense"],
                                lp["output"]["dense"],
                                lp["output"]["LayerNorm"], x,
                                cfg.layer_norm_eps, cfg.fast_gelu)

        # masked mean pooling (the reference's utterance embedding)
        from ..core.masking import masked_mean

        pooled = masked_mean(
            x, None if attention_mask is None else attention_mask == 0)
        return x, pooled

    def from_torch_state_dict(self, sd: dict):
        """Load an HF ``BertModel`` state dict (tensor names preserved).

        Names and shapes are validated against the expected tree (via
        ``jax.eval_shape`` — no weights are materialised for the check).
        HF's ``pooler.*`` (unused here — we masked-mean pool) and the
        ``position_ids`` buffer are skipped.
        """
        from ..nn.module import flatten_params, unflatten_params

        flat = {}
        for name, tensor in sd.items():
            if name.startswith("bert."):
                name = name[len("bert."):]
            if name.startswith("pooler.") or "position_ids" in name:
                continue
            arr = jnp.asarray(tensor.detach().cpu().numpy() if hasattr(tensor, "detach") else tensor)
            flat[name] = arr
        expected = flatten_params(jax.eval_shape(self.init, jax.random.key(0)))
        missing = sorted(set(expected) - set(flat))
        unexpected = sorted(set(flat) - set(expected))
        if missing or unexpected:
            raise KeyError(f"BERT state_dict mismatch: missing={missing[:6]} "
                           f"unexpected={unexpected[:6]}")
        for name, spec in expected.items():
            if tuple(flat[name].shape) != tuple(spec.shape):
                raise ValueError(f"shape mismatch for {name}: "
                                 f"{flat[name].shape} vs {spec.shape}")
        self.params = unflatten_params(flat)
        return self
