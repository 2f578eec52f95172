"""WavLM audio frontend in pure JAX.

WavLM has no official Flax port (SURVEY.md §7 step 9 'hard parts' #2);
this is a ground-up JAX implementation of the architecture — conv feature
encoder, feature projection, convolutional positional embedding, and a
transformer encoder with WavLM's **gated relative position bias** — with
parameter names mirroring the HF ``WavLMModel`` state dict so pretrained
``microsoft/wavlm-base-plus`` weights (the reference's audio frontend,
extract_audio_feats_wavlm_seq.py:22) load via
:meth:`WavLMEncoder.from_torch_state_dict`.

Architecture notes (base/base-plus, ``do_stable_layer_norm=False``):
  * feature encoder: 7 Conv1d (512ch, kernels 10/3/3/3/3/2/2, strides
    5/2/2/2/2/2/2, no bias) + GELU; layer 0 followed by a per-channel
    GroupNorm (num_groups == num_channels);
  * feature projection: LN(512) → Linear(512→768);
  * positional embedding: grouped Conv1d (k=128, groups=16, same-pad with
    one trailing column removed) + GELU, added to the input;
  * encoder layers (post-norm): self-attention with a T5-style bucketed
    relative position bias shared across layers (embedded once in layer 0)
    that each layer *gates* per (batch, head, query) via a small
    sigmoid network over the query vectors.

The waveform→frame mask downsampling uses the exact conv-length formula
(replacing the reference's nearest-index linspace approximation,
extract_audio_feats_wavlm.py:63-67 — HF semantics are the ground truth
here and the reference feeds masks through HF's processor anyway).
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from ..core.masking import NEG_INF
from ..nn.layers import layer_norm_apply, linear_apply
from ..nn.module import Module, unflatten_params


@dataclasses.dataclass
class WavLMConfig:
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    conv_dim: tuple = (512, 512, 512, 512, 512, 512, 512)
    conv_kernel: tuple = (10, 3, 3, 3, 3, 2, 2)
    conv_stride: tuple = (5, 2, 2, 2, 2, 2, 2)
    conv_bias: bool = False
    num_conv_pos_embeddings: int = 128
    num_conv_pos_embedding_groups: int = 16
    num_buckets: int = 320
    max_bucket_distance: int = 800
    layer_norm_eps: float = 1e-5
    # tanh-approximate GELU: ~3x cheaper on the TPU VPU than the exact erf
    # form (measured: 5.7 vs 18.4 ms on the conv0 activation at B=64).
    # Default False = bit-parity with HF; flip for serving where ~1e-3
    # activation deltas are acceptable.
    fast_gelu: bool = False

    @classmethod
    def base_plus(cls):
        return cls()

    @classmethod
    def tiny(cls, **kw):
        d = dict(hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
                 intermediate_size=64, conv_dim=(16, 16, 16),
                 conv_kernel=(10, 3, 2), conv_stride=(5, 2, 2),
                 num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
                 num_buckets=40, max_bucket_distance=100)
        d.update(kw)
        return cls(**d)


def _ffn_block(ffp, ln, x, eps, fast_gelu):
    """Post-norm FFN block; routes to the fused Pallas kernel when the
    params are int8-quantized on TPU (ops/fused_ffn.py docstring has the
    measured routing table)."""
    from ..ops.fused_ffn import route_ffn_block

    return route_ffn_block(ffp["intermediate_dense"], ffp["output_dense"],
                           ln, x, eps, fast_gelu)


def conv1d(x, weight, bias=None, stride=1, padding=0, groups=1):
    """x [B,C,L], weight [O, I/groups, K] (torch layout)."""
    out = jax.lax.conv_general_dilated(
        x, weight, window_strides=(stride,), padding=[(padding, padding)],
        dimension_numbers=("NCH", "OIH", "NCH"), feature_group_count=groups,
    )
    if bias is not None:
        out = out + bias[None, :, None]
    return out


def group_norm_per_channel(p, x, eps=1e-5):
    """GroupNorm with num_groups == num_channels (instance norm). x [B,C,L]."""
    mean = x.mean(axis=-1, keepdims=True)
    var = ((x - mean) ** 2).mean(axis=-1, keepdims=True)
    xn = (x - mean) * jax.lax.rsqrt(var + eps)
    return xn * p["weight"][None, :, None] + p["bias"][None, :, None]


def feat_extract_output_lengths(cfg: WavLMConfig, input_lengths):
    """Conv stack output length (HF _get_feat_extract_output_lengths)."""
    lengths = input_lengths
    for k, s in zip(cfg.conv_kernel, cfg.conv_stride):
        lengths = (lengths - k) // s + 1
    return lengths


def relative_position_buckets(cfg: WavLMConfig, length: int):
    """T5-style bidirectional bucketing ([L, L] int) — HF compute_bias."""
    n = cfg.num_buckets // 2
    ctx = jnp.arange(length)[:, None]
    mem = jnp.arange(length)[None, :]
    rel = mem - ctx
    buckets = (rel > 0).astype(jnp.int32) * n
    rel = jnp.abs(rel)
    max_exact = n // 2
    is_small = rel < max_exact
    rel_large = (
        max_exact
        + (jnp.log(rel.astype(jnp.float32) / max_exact)
           / math.log(cfg.max_bucket_distance / max_exact)
           * (n - max_exact)).astype(jnp.int32)
    )
    rel_large = jnp.minimum(rel_large, n - 1)
    return buckets + jnp.where(is_small, rel, rel_large)


class WavLMEncoder(Module):
    def __init__(self, config: WavLMConfig | None = None, seed: int = 0):
        self.config = config or WavLMConfig()
        self.seed = seed

    # --------------------------------------------------------------- init
    def init(self, key):
        cfg = self.config
        d, ff, h = cfg.hidden_size, cfg.intermediate_size, cfg.num_attention_heads
        keys = iter(jax.random.split(key, 64 + 16 * cfg.num_hidden_layers))
        nrm = lambda n: {"weight": jnp.ones((n,)), "bias": jnp.zeros((n,))}
        lin = lambda din, dout: {
            "weight": jax.random.normal(next(keys), (dout, din)) * 0.02,
            "bias": jnp.zeros((dout,)),
        }

        convs = {}
        for i, (cd, k) in enumerate(zip(cfg.conv_dim, cfg.conv_kernel)):
            cin = 1 if i == 0 else cfg.conv_dim[i - 1]
            layer = {"conv": {"weight": jax.random.normal(next(keys), (cd, cin, k))
                              * math.sqrt(2.0 / (cin * k))}}
            if cfg.conv_bias:
                layer["conv"]["bias"] = jnp.zeros((cd,))
            if i == 0:
                layer["layer_norm"] = nrm(cd)
            convs[str(i)] = layer

        k_pos = cfg.num_conv_pos_embeddings
        pos_groups = cfg.num_conv_pos_embedding_groups
        params = {
            "feature_extractor": {"conv_layers": convs},
            "feature_projection": {
                "layer_norm": nrm(cfg.conv_dim[-1]),
                "projection": lin(cfg.conv_dim[-1], d),
            },
            "encoder": {
                "pos_conv_embed": {"conv": {
                    "weight": jax.random.normal(next(keys), (d, d // pos_groups, k_pos))
                    * (2 * math.sqrt(1.0 / (k_pos * d))),
                    "bias": jnp.zeros((d,)),
                }},
                "layer_norm": nrm(d),
                "layers": {},
            },
        }
        for i in range(cfg.num_hidden_layers):
            attn = {
                "q_proj": lin(d, d), "k_proj": lin(d, d),
                "v_proj": lin(d, d), "out_proj": lin(d, d),
                "gru_rel_pos_const": jnp.ones((1, h, 1, 1)),
                "gru_rel_pos_linear": lin(d // h, 8),
            }
            if i == 0:
                attn["rel_attn_embed"] = {
                    "weight": jax.random.normal(next(keys), (cfg.num_buckets, h)) * 0.02
                }
            params["encoder"]["layers"][str(i)] = {
                "attention": attn,
                "layer_norm": nrm(d),
                "feed_forward": {
                    "intermediate_dense": lin(d, ff),
                    "output_dense": lin(ff, d),
                },
                "final_layer_norm": nrm(d),
            }
        return params

    # ------------------------------------------------------------ forward
    def _feature_encoder(self, params, input_values):
        cfg = self.config
        from ..ops.conv_stack import conv_stack_fused, use_conv_stack

        if use_conv_stack(cfg, params["feature_extractor"]):
            # fused Pallas conv pipeline — currently routed OFF: it LOST
            # the whole-model A/B to XLA's conv pipeline (numbers in
            # ops/conv_stack.py use_conv_stack docstring)
            return conv_stack_fused(params["feature_extractor"],
                                    input_values, cfg)
        x = input_values[:, None, :]  # [B, 1, T]
        for i in range(len(cfg.conv_dim)):
            lp = params["feature_extractor"]["conv_layers"][str(i)]
            stats_gn = (i == 0 and cfg.conv_kernel[0] == 10
                        and cfg.conv_stride[0] == 5
                        and lp["conv"].get("bias") is None
                        and "layer_norm" in lp)
            if stats_gn:
                # GroupNorm stats via the waveform Gram matrix — conv0 is
                # linear, so the per-channel moments of its output come
                # from a 10x10 Gram of the input phase view. This deletes
                # GN's two full passes over the conv0 activation (2 x
                # 2.1 GB at the 10 s bucket) and lets normalise+GELU fuse
                # into conv0's output pass (ops/conv_stack.py).
                from ..ops.conv_stack import group_norm_stats_from_waveform

                mean, var = group_norm_stats_from_waveform(
                    input_values, lp["conv"]["weight"])
            x = conv1d(x, lp["conv"]["weight"], lp["conv"].get("bias"),
                       stride=cfg.conv_stride[i])
            if i == 0:
                if stats_gn:
                    gp = lp["layer_norm"]
                    rstd = jax.lax.rsqrt(var + cfg.layer_norm_eps)
                    x = ((x.astype(jnp.float32) - mean[:, :, None])
                         * rstd[:, :, None]
                         * gp["weight"].astype(jnp.float32)[None, :, None]
                         + gp["bias"].astype(jnp.float32)[None, :, None]
                         ).astype(x.dtype)
                else:
                    x = group_norm_per_channel(lp["layer_norm"], x,
                                               cfg.layer_norm_eps)
            x = jax.nn.gelu(x, approximate=cfg.fast_gelu)
        return x.transpose(0, 2, 1)  # [B, T', C]

    def _attention(self, params, x, kpm_bias, position_bias):
        cfg = self.config
        b, l, d = x.shape
        h = cfg.num_attention_heads
        hd = d // h

        # gate over query vectors (WavLM's gated relative position bias).
        # The 64->8 gate Linear is SHARED across heads (HF WavLM semantics,
        # init: lin(d//h, 8)), so it can run directly on the [B,L,H,hd]
        # reshape — transposing the full 50 MB x tensor first (the HF
        # op order) buys nothing; only the tiny [B,L,H] gate result needs
        # relayout to [B,H,L].
        ghs = x.reshape(b, l, h, hd)  # [B,L,H,hd] — free reshape
        proj = linear_apply(params["gru_rel_pos_linear"], ghs)  # [B,L,H,8]
        proj = proj.reshape(b, l, h, 2, 4).sum(-1)  # [B,L,H,2]
        gates = jax.nn.sigmoid(proj)
        gate_a, gate_b = gates[..., 0:1], gates[..., 1:2]  # [B,L,H,1]
        const = params["gru_rel_pos_const"].reshape(1, 1, h, 1)
        gate_out = gate_a * (gate_b * const - 1.0) + 2.0
        gate_out = gate_out.transpose(0, 2, 1, 3)  # [B,H,L,1] (small)

        # NB: packing q/k/v into one concatenated int8 GEMM was tried and
        # LOST the whole-model A/B (WavLM 10s bucket: 124.6 vs 113.1 ms
        # fused / 127.3 vs 120.7 unfused) — XLA schedules the three dots
        # better than the hand-packed one. linear_apply dispatches int8
        # per-projection when the tree is quantized.
        q = linear_apply(params["q_proj"], x).reshape(b, l, h, hd).transpose(0, 2, 1, 3)
        k = linear_apply(params["k_proj"], x).reshape(b, l, h, hd).transpose(0, 2, 1, 3)
        v = linear_apply(params["v_proj"], x).reshape(b, l, h, hd).transpose(0, 2, 1, 3)

        from ..ops.wavlm_attention import use_fused, wavlm_fused_attention

        if use_fused(l, hd):
            # fused kernel: streams the shared [H,L,L] bias and applies the
            # gate in-register — avoids the [B,H,L,L] HBM materialisation
            kpb = (kpm_bias[:, 0, 0, :] if kpm_bias is not None
                   else jnp.zeros((b, l), jnp.float32))
            ctx = wavlm_fused_attention(q, k, v, gate_out[..., 0],
                                        position_bias, kpb)
        else:
            gated_bias = gate_out * position_bias[None]  # [B,H,L,L]
            scores = jnp.einsum("bhqd,bhkd->bhqk", q / math.sqrt(hd), k,
                                preferred_element_type=jnp.float32)
            scores = scores + gated_bias.astype(scores.dtype)
            if kpm_bias is not None:
                scores = scores + kpm_bias
            probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
            ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(b, l, d)
        return linear_apply(params["out_proj"], ctx)

    def apply(self, params, input_values, attention_mask=None):
        """input_values [B,T] f32 waveform; attention_mask [B,T] 1=valid.

        Returns ``(last_hidden_state [B,T',d], frame_attention_mask [B,T'] 1=valid)``.
        """
        cfg = self.config
        eps = cfg.layer_norm_eps

        feats = self._feature_encoder(params, input_values)  # [B, T', C]
        t_out = feats.shape[1]

        frame_mask = None
        kpm_bias = None
        if attention_mask is not None:
            out_lengths = feat_extract_output_lengths(cfg, attention_mask.sum(axis=-1))
            frame_mask = (jnp.arange(t_out)[None, :] < out_lengths[:, None]).astype(jnp.int32)
            kpm_bias = jnp.where(frame_mask == 0, NEG_INF, 0.0).astype(jnp.float32)
            kpm_bias = kpm_bias[:, None, None, :]

        fp = params["feature_projection"]
        x = layer_norm_apply(fp["layer_norm"], feats, eps)
        x = linear_apply(fp["projection"], x)

        if frame_mask is not None:
            x = x * frame_mask[:, :, None].astype(x.dtype)  # zero padded frames

        # convolutional positional embedding (same-pad, drop last column)
        pc = params["encoder"]["pos_conv_embed"]["conv"]
        pos = conv1d(x.transpose(0, 2, 1), pc["weight"], pc["bias"],
                     padding=cfg.num_conv_pos_embeddings // 2,
                     groups=cfg.num_conv_pos_embedding_groups)
        if cfg.num_conv_pos_embeddings % 2 == 0:
            pos = pos[:, :, :-1]
        pos = jax.nn.gelu(pos, approximate=cfg.fast_gelu).transpose(0, 2, 1)
        x = x + pos
        x = layer_norm_apply(params["encoder"]["layer_norm"], x, eps)

        # shared relative position bias from layer 0's embedding
        buckets = relative_position_buckets(cfg, t_out)  # [L, L]
        rel_embed = params["encoder"]["layers"]["0"]["attention"]["rel_attn_embed"]["weight"]
        position_bias = rel_embed[buckets].transpose(2, 0, 1)  # [H, L, L]

        from ..ops.attention_block import attention_block_int8, use_attention_block

        if use_attention_block(
                params["encoder"]["layers"]["0"]["attention"], t_out,
                cfg.hidden_size):
            # int8 serving megakernel: the whole attention sublayer in one
            # Pallas pass (see ops/attention_block.py for the measured
            # rationale). Pad L once to the 128 tile up front and slice
            # once at the end — padded rows carry garbage but padded KEYS
            # stay masked via kbias, so valid outputs are untouched.
            pad = (-t_out) % 128
            xpad = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
            kpb = (kpm_bias[:, 0, 0, :] if kpm_bias is not None
                   else jnp.zeros((x.shape[0], t_out), jnp.float32))
            kpb = jnp.pad(kpb, ((0, 0), (0, pad)), constant_values=NEG_INF)
            posp = jnp.pad(position_bias, ((0, 0), (0, pad), (0, pad)))
            x = xpad
            for i in range(cfg.num_hidden_layers):
                lp = params["encoder"]["layers"][str(i)]
                x = attention_block_int8(lp["attention"], lp["layer_norm"],
                                         x, posp, kpb, eps)
                x = _ffn_block(lp["feed_forward"], lp["final_layer_norm"], x,
                               eps, cfg.fast_gelu)
            return x[:, :t_out], frame_mask

        for i in range(cfg.num_hidden_layers):
            lp = params["encoder"]["layers"][str(i)]
            attn = self._attention(lp["attention"], x, kpm_bias, position_bias)
            x = layer_norm_apply(lp["layer_norm"], x + attn, eps)
            x = _ffn_block(lp["feed_forward"], lp["final_layer_norm"], x, eps,
                           cfg.fast_gelu)

        return x, frame_mask

    # ------------------------------------------------------------- bridge
    def from_torch_state_dict(self, sd: dict):
        """Load an HF ``WavLMModel`` state dict.

        Handles the weight-normed positional conv (``parametrizations.
        weight.original0/1`` → effective weight) and skips pretraining-only
        tensors (``masked_spec_embed``).
        """
        import numpy as np

        def to_np(t):
            return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)

        flat = {}
        pos_g = pos_v = None
        for name, tensor in sd.items():
            if name.startswith("wavlm."):
                name = name[len("wavlm."):]
            if name == "masked_spec_embed" or "adapter" in name:
                continue
            if "pos_conv_embed.conv.parametrizations.weight.original0" in name:
                pos_g = to_np(tensor)
                continue
            if "pos_conv_embed.conv.parametrizations.weight.original1" in name:
                pos_v = to_np(tensor)
                continue
            if "pos_conv_embed.conv.weight_g" in name:
                pos_g = to_np(tensor)
                continue
            if "pos_conv_embed.conv.weight_v" in name:
                pos_v = to_np(tensor)
                continue
            flat[name] = jnp.asarray(to_np(tensor))

        if pos_g is not None and pos_v is not None:
            # torch weight_norm(dim=2): per-k normalisation over (out, in) dims
            norm = np.sqrt((pos_v ** 2).sum(axis=(0, 1), keepdims=True))
            flat["encoder.pos_conv_embed.conv.weight"] = jnp.asarray(pos_g * pos_v / norm)

        from ..nn.module import flatten_params

        expected = flatten_params(jax.eval_shape(self.init, jax.random.key(0)))
        missing = sorted(set(expected) - set(flat))
        unexpected = sorted(set(flat) - set(expected))
        if missing or unexpected:
            raise KeyError(f"WavLM state_dict mismatch: missing={missing[:6]} "
                           f"unexpected={unexpected[:6]}")
        for name, spec in expected.items():
            if tuple(flat[name].shape) != tuple(spec.shape):
                raise ValueError(f"shape mismatch for {name}: "
                                 f"{flat[name].shape} vs {spec.shape}")
        self.params = unflatten_params(flat)
        return self
