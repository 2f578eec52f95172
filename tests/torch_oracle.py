"""Compact torch oracle models for numeric parity tests.

These are *test fixtures*, not framework code: minimal eval-mode torch
modules with the same architecture and state_dict names as the hriemo
model zoo (and hence as reference HRI-EMO checkpoints). They exist so the
tests can assert ≤1e-4 logit divergence and round-trip checkpoints by
name without touching the read-only reference repo.
"""

import torch
import torch.nn as nn

MHA = lambda d, h, p: nn.MultiheadAttention(d, h, dropout=p, batch_first=True)
FFN = lambda d: nn.Sequential(nn.Linear(d, 4 * d), nn.ReLU(), nn.Linear(4 * d, d))


def masked_mean_t(x, mask):
    if mask is None:
        return x.mean(dim=1)
    valid = (~mask).float()
    denom = valid.sum(dim=1, keepdim=True).clamp(min=1.0)
    return (x * valid.unsqueeze(-1)).sum(dim=1) / denom


class OracleLegacyBlock(nn.Module):
    def __init__(self, d=768, h=8, p=0.1):
        super().__init__()
        self.attn_a2t, self.attn_t2a = MHA(d, h, p), MHA(d, h, p)
        self.ffn_a, self.ffn_t = FFN(d), FFN(d)
        self.norm_a1, self.norm_a2 = nn.LayerNorm(d), nn.LayerNorm(d)
        self.norm_t1, self.norm_t2 = nn.LayerNorm(d), nn.LayerNorm(d)
        self.dropout = nn.Dropout(p)

    def forward(self, h_a, h_t, mask_a=None, mask_t=None):
        a2t, _ = self.attn_a2t(h_a, h_t, h_t, key_padding_mask=mask_t)
        ha = self.norm_a1(h_a + self.dropout(a2t))
        ha = self.norm_a2(ha + self.dropout(self.ffn_a(ha)))
        t2a, _ = self.attn_t2a(h_t, h_a, h_a, key_padding_mask=mask_a)
        ht = self.norm_t1(h_t + self.dropout(t2a))
        ht = self.norm_t2(ht + self.dropout(self.ffn_t(ht)))
        return ha, ht


class OracleTacfnBlock(nn.Module):
    def __init__(self, d=768, h=8, p=0.1):
        super().__init__()
        self.self_attn_a, self.self_attn_t = MHA(d, h, p), MHA(d, h, p)
        self.self_norm_a, self.self_norm_t = nn.LayerNorm(d), nn.LayerNorm(d)
        self.attn_a2t, self.attn_t2a = MHA(d, h, p), MHA(d, h, p)
        self.ffn_a, self.ffn_t = FFN(d), FFN(d)
        self.norm_a1, self.norm_a2 = nn.LayerNorm(d), nn.LayerNorm(d)
        self.norm_t1, self.norm_t2 = nn.LayerNorm(d), nn.LayerNorm(d)
        self.dropout = nn.Dropout(p)

    def forward(self, h_a, h_t, mask_a=None, mask_t=None, return_attention=False):
        maps = {}
        a_sa, w = self.self_attn_a(h_a, h_a, h_a, key_padding_mask=mask_a, need_weights=return_attention)
        ha = self.self_norm_a(h_a + self.dropout(a_sa))
        maps["audio_self"] = w
        t_sa, w = self.self_attn_t(h_t, h_t, h_t, key_padding_mask=mask_t, need_weights=return_attention)
        ht = self.self_norm_t(h_t + self.dropout(t_sa))
        maps["text_self"] = w
        a2t, w = self.attn_a2t(ha, ht, ht, key_padding_mask=mask_t, need_weights=return_attention)
        ha_cm = self.norm_a1(ha + self.dropout(a2t))
        ha_cm = self.norm_a2(ha_cm + self.dropout(self.ffn_a(ha_cm)))
        maps["audio_queries_text"] = w
        t2a, w = self.attn_t2a(ht, ha, ha, key_padding_mask=mask_a, need_weights=return_attention)
        ht_cm = self.norm_t1(ht + self.dropout(t2a))
        ht_cm = self.norm_t2(ht_cm + self.dropout(self.ffn_t(ht_cm)))
        maps["text_queries_audio"] = w
        if return_attention:
            return ha_cm, ht_cm, maps
        return ha_cm, ht_cm


class OracleStack(nn.Module):
    def __init__(self, block_cls, n=2, d=768, h=8, p=0.1):
        super().__init__()
        self.layers = nn.ModuleList([block_cls(d, h, p) for _ in range(n)])

    def forward(self, h_a, h_t, mask_a=None, mask_t=None, return_attention=False):
        attns = []
        for layer in self.layers:
            if isinstance(layer, OracleTacfnBlock) and return_attention:
                h_a, h_t, m = layer(h_a, h_t, mask_a, mask_t, return_attention=True)
                attns.append(m)
            else:
                h_a, h_t = layer(h_a, h_t, mask_a, mask_t)
        return (h_a, h_t, attns) if return_attention else (h_a, h_t)


class OracleScalarGate(nn.Module):
    def __init__(self, d=768, hidden=256):
        super().__init__()
        self.mlp = nn.Sequential(nn.Linear(4 * d, hidden), nn.ReLU(), nn.Linear(hidden, 1))

    def forward(self, h_a, h_t, mask_a=None, mask_t=None):
        a, t = masked_mean_t(h_a, mask_a), masked_mean_t(h_t, mask_t)
        beta = torch.sigmoid(self.mlp(torch.cat([a, t, (a - t).abs(), a * t], -1)))
        L = h_a.size(1) if h_a.size(1) == h_t.size(1) else h_t.size(1)
        h_a, h_t = h_a[:, :L], h_t[:, :L]
        bb = beta.view(-1, 1, 1)
        return bb * h_a + (1 - bb) * h_t, beta


class OracleVectorGate(nn.Module):
    def __init__(self, d=768, hidden=256):
        super().__init__()
        self.norm_a, self.norm_t = nn.LayerNorm(d), nn.LayerNorm(d)
        self.mlp = nn.Sequential(nn.Linear(4 * d, hidden), nn.ReLU(), nn.Linear(hidden, d))

    def forward(self, h_a, h_t, mask_a=None, mask_t=None):
        ha, ht = self.norm_a(h_a), self.norm_t(h_t)
        a, t = masked_mean_t(ha, mask_a), masked_mean_t(ht, mask_t)
        w = torch.sigmoid(self.mlp(torch.cat([a, t, (a - t).abs(), a * t], -1)))
        beta = w.mean(-1, keepdim=True)
        L = ha.size(1) if ha.size(1) == ht.size(1) else ht.size(1)
        ha, ht = ha[:, :L], ht[:, :L]
        wb = w.unsqueeze(1)
        return wb * ha + (1 - wb) * ht, beta


class OracleDecoderLayer(nn.Module):
    def __init__(self, d, h, ff=2048, p=0.1):
        super().__init__()
        self.self_attn, self.cross_attn = MHA(d, h, p), MHA(d, h, p)
        self.norm1, self.norm2, self.norm3 = nn.LayerNorm(d), nn.LayerNorm(d), nn.LayerNorm(d)
        self.dropout1, self.dropout2, self.dropout3 = nn.Dropout(p), nn.Dropout(p), nn.Dropout(p)
        self.linear1, self.linear2 = nn.Linear(d, ff), nn.Linear(ff, d)
        self.dropout = nn.Dropout(p)

    def forward(self, tgt, memory, memory_key_padding_mask=None, return_attention=False):
        t2, _ = self.self_attn(tgt, tgt, tgt, need_weights=False)
        tgt = self.norm1(tgt + self.dropout1(t2))
        t2, w = self.cross_attn(tgt, memory, memory,
                                key_padding_mask=memory_key_padding_mask,
                                need_weights=return_attention)
        tgt = self.norm2(tgt + self.dropout2(t2))
        t2 = self.linear2(self.dropout(torch.relu(self.linear1(tgt))))
        tgt = self.norm3(tgt + self.dropout3(t2))
        return tgt, w


class OracleEmotionDecoder(nn.Module):
    def __init__(self, d=768, num_emotions=4, h=8, n=2, ff=2048, p=0.1, out=True):
        super().__init__()
        self.emotion_queries = nn.Parameter(torch.randn(num_emotions, d))
        self.layers = nn.ModuleList([OracleDecoderLayer(d, h, ff, p) for _ in range(n)])
        self.out_proj = nn.Linear(d, 1) if out else None

    def forward(self, memory, memory_key_padding_mask=None, return_attention=False):
        out = self.emotion_queries.unsqueeze(0).expand(memory.size(0), -1, -1)
        attns = []
        for layer in self.layers:
            out, w = layer(out, memory, memory_key_padding_mask, return_attention)
            if return_attention and w is not None:
                attns.append(w)
        logits = self.out_proj(out).squeeze(-1) if self.out_proj is not None else None
        return (out, logits, attns) if return_attention else (out, logits)


def fused_mask_t(mask_a, mask_t, L):
    def fit(m):
        if m is None:
            return None
        if m.size(1) >= L:
            return m[:, :L]
        pad = torch.ones(m.size(0), L - m.size(1), dtype=torch.bool)
        return torch.cat([m, pad], 1)
    ma, mt = fit(mask_a), fit(mask_t)
    if ma is None:
        return mt
    if mt is None:
        return ma
    return ma | mt


class OracleFusionClassifier(nn.Module):
    def __init__(self, d=768, num_classes=4, h=8, n=2, beta_hidden=256, p=0.2):
        super().__init__()
        self.cross_modal = OracleStack(OracleTacfnBlock, n, d, h, p)
        self.beta_gate = OracleVectorGate(d, beta_hidden)
        self.classifier = nn.Sequential(
            nn.LayerNorm(d), nn.Linear(d, d), nn.ReLU(), nn.Dropout(p), nn.Linear(d, num_classes)
        )

    def forward(self, h_a, h_t, mask_a=None, mask_t=None):
        if h_a.dim() == 2:
            h_a = h_a.unsqueeze(1)
        if h_t.dim() == 2:
            h_t = h_t.unsqueeze(1)
        ha, ht = self.cross_modal(h_a, h_t, mask_a, mask_t)
        fused, beta = self.beta_gate(ha, ht, mask_a, mask_t)
        pooled = fused.mean(dim=1)
        return self.classifier(pooled), beta, pooled


class OracleFusionWithEmotionDecoder(nn.Module):
    def __init__(self, d=768, num_emotions=4, h=8, n_fusion=2, n_decoder=2,
                 beta_hidden=256, p=0.1):
        super().__init__()
        self.cross_modal = OracleStack(OracleTacfnBlock, n_fusion, d, h, p)
        self.beta_gate = OracleVectorGate(d, beta_hidden)
        self.emotion_decoder = OracleEmotionDecoder(d, num_emotions, h, n_decoder, p=p)

    def forward(self, h_a, h_t, mask_a=None, mask_t=None, return_attention=False):
        if h_a.dim() == 2:
            h_a = h_a.unsqueeze(1)
        if h_t.dim() == 2:
            h_t = h_t.unsqueeze(1)
        if return_attention:
            ha, ht, enc = self.cross_modal(h_a, h_t, mask_a, mask_t, return_attention=True)
        else:
            ha, ht = self.cross_modal(h_a, h_t, mask_a, mask_t)
            enc = None
        fused, beta = self.beta_gate(ha, ht, mask_a, mask_t)
        fmask = fused_mask_t(mask_a, mask_t, fused.size(1))
        if return_attention:
            z, logits, dec = self.emotion_decoder(fused, fmask, return_attention=True)
            return logits, beta, z, {"encoder": enc, "decoder": dec}
        z, logits = self.emotion_decoder(fused, fmask)
        return logits, beta, z


class OracleMosei(nn.Module):
    def __init__(self, d_audio, d_text, d=256, num_emotions=6, h=4,
                 n_fusion=2, n_decoder=2, beta_hidden=128, p=0.2):
        super().__init__()
        self.audio_proj = nn.Linear(d_audio, d)
        self.text_proj = nn.Linear(d_text, d)
        self.backbone = OracleFusionWithEmotionDecoder(
            d, num_emotions, h, n_fusion, n_decoder, beta_hidden, p)

    def forward(self, h_a, h_t, mask_a=None, mask_t=None, return_attention=False):
        return self.backbone(self.audio_proj(h_a), self.text_proj(h_t),
                             mask_a, mask_t, return_attention)
