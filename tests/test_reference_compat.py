"""Reference-style usage runs unchanged (BASELINE: 'tests/ suite pass
unchanged within fp32 tolerance').

These mirror the upstream smoke tests' exact import paths and torch-tensor
call style (reference: tests/test_cross_modal_block.py, test_beta_gate.py,
test_fusion_classifier.py) against the hriemo implementations via the
``models`` compatibility package.
"""

import torch


def test_reference_style_cross_modal_block():
    from models.cross_modal_block import CrossModalTransformer

    model = CrossModalTransformer(num_layers=2, d_model=64, n_heads=4)
    # utter-level pass, torch tensors in
    h_a = torch.randn(8, 1, 64)
    h_t = torch.randn(8, 1, 64)
    out_a, out_t = model(h_a, h_t)
    assert tuple(out_a.shape) == (8, 1, 64)
    assert tuple(out_t.shape) == (8, 1, 64)
    # seq-level ragged pass with all-False masks (reference style)
    h_a = torch.randn(2, 40, 64)
    h_t = torch.randn(2, 12, 64)
    mask_a = torch.zeros(2, 40, dtype=torch.bool)
    mask_t = torch.zeros(2, 12, dtype=torch.bool)
    out_a, out_t = model(h_a, h_t, mask_a, mask_t)
    assert tuple(out_a.shape) == (2, 40, 64)


def test_reference_style_beta_gate_chain():
    from models.cross_modal_block import CrossModalTransformer
    from models.beta_gate import BetaGate

    cm = CrossModalTransformer(num_layers=1, d_model=64, n_heads=4)
    gate = BetaGate(d_model=64, hidden_dim=32)
    h_a = torch.randn(8, 1, 64)
    h_t = torch.randn(8, 1, 64)
    a, t = cm(h_a, h_t)
    fused, beta = gate(a, t)
    assert tuple(fused.shape) == (8, 1, 64)
    assert tuple(beta.shape) == (8, 1)


def test_reference_style_fusion_classifier():
    from models.fusion_classifier import FusionClassifier

    model = FusionClassifier(d_model=64, num_classes=4, n_heads=4,
                             num_layers=1, beta_hidden=32)
    logits, beta, pooled = model(torch.randn(4, 64), torch.randn(4, 64))
    assert tuple(logits.shape) == (4, 4)
    logits, beta, pooled = model(torch.randn(4, 20, 64), torch.randn(4, 20, 64))
    assert tuple(logits.shape) == (4, 4)
    assert tuple(pooled.shape) == (4, 64)


def test_reference_style_tacfn_and_decoder():
    from models.cross_modal_block_tacfn import CrossModalTransformer
    from models.emotion_decoder import EmotionDecoder

    cm = CrossModalTransformer(num_layers=1, d_model=64, n_heads=4)
    a, t, attn = cm(torch.randn(2, 10, 64), torch.randn(2, 6, 64),
                    return_attention=True)
    assert set(attn[0].keys()) == {"audio_self", "text_self",
                                   "audio_queries_text", "text_queries_audio"}
    dec = EmotionDecoder(d_model=64, num_emotions=4, n_heads=4, num_layers=1,
                         dim_feedforward=128)
    z, logits = dec(torch.randn(2, 10, 64))
    assert tuple(logits.shape) == (2, 4)
