"""Mask-correctness property tests (SURVEY.md §4: a gap the reference never
filled — nothing checks that PAD positions cannot influence results).

Property under test everywhere: **the content of padded positions must not
affect any output** — garbage written into padded frames/tokens changes
nothing, and growing the padding (bucketing) changes nothing.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from hriemo.core import masked_mean
from hriemo.models import FusionWithEmotionDecoder, MoseiFusionWithEmotionDecoder
from hriemo.nn import MultiheadAttention

ATOL = 1e-5


def _corrupt(x, mask, rng):
    """Overwrite padded positions with large garbage."""
    noise = rng.standard_normal(x.shape).astype(np.float32) * 100.0
    m = np.asarray(mask)[..., None]
    return jnp.asarray(np.where(m, noise, np.asarray(x)))


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_masked_mean_ignores_padded_content(seed):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((3, 11, 5)).astype(np.float32)
    mask = rng.uniform(size=(3, 11)) > 0.6
    mask[:, 0] = False  # at least one valid
    a = masked_mean(jnp.asarray(x), jnp.asarray(mask))
    b = masked_mean(_corrupt(x, mask, rng), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=ATOL)


@pytest.mark.parametrize("seed", [0, 1])
def test_attention_output_ignores_padded_keys(seed):
    rng = np.random.default_rng(seed)
    mha = MultiheadAttention(32, 4)
    q = jnp.asarray(rng.standard_normal((2, 5, 32)).astype(np.float32))
    kv = rng.standard_normal((2, 9, 32)).astype(np.float32)
    mask = np.zeros((2, 9), bool)
    mask[0, 5:] = True
    mask[1, 3:] = True
    out1, _ = mha(q, jnp.asarray(kv), jnp.asarray(kv), key_padding_mask=jnp.asarray(mask))
    kv2 = _corrupt(kv, mask, rng)
    out2, _ = mha(q, kv2, kv2, key_padding_mask=jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=ATOL)


def test_model_logits_ignore_padded_content():
    """Full flagship stack: garbage in padded frames/tokens → same logits."""
    rng = np.random.default_rng(3)
    model = MoseiFusionWithEmotionDecoder(
        d_audio=8, d_text=12, d_model=32, num_emotions=6, n_heads=4,
        num_layers_fusion=2, num_layers_decoder=2, beta_hidden=16, dropout=0.0)
    h_a = rng.standard_normal((2, 10, 8)).astype(np.float32)
    h_t = rng.standard_normal((2, 7, 12)).astype(np.float32)
    mask_a = np.zeros((2, 10), bool); mask_a[0, 6:] = True; mask_a[1, 8:] = True
    mask_t = np.zeros((2, 7), bool); mask_t[0, 4:] = True

    l1, b1, _ = model(jnp.asarray(h_a), jnp.asarray(h_t),
                      jnp.asarray(mask_a), jnp.asarray(mask_t))
    l2, b2, _ = model(_corrupt(h_a, mask_a, rng), _corrupt(h_t, mask_t, rng),
                      jnp.asarray(mask_a), jnp.asarray(mask_t))
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=1e-4)
    np.testing.assert_allclose(np.asarray(b1), np.asarray(b2), atol=1e-4)


def test_bucketing_pad_invariance():
    """Growing the padding (bucketing to a larger static shape) must not
    change logits — this is what makes static-bucket batching numerically
    equal to the reference's dynamic per-batch padding."""
    rng = np.random.default_rng(4)
    model = FusionWithEmotionDecoder(d_model=32, num_emotions=4, n_heads=4,
                                     num_layers_fusion=1, num_layers_decoder=1,
                                     beta_hidden=16, dropout=0.0)
    b, la, lt, d = 2, 6, 5, 32
    h_a = rng.standard_normal((b, la, d)).astype(np.float32)
    h_t = rng.standard_normal((b, lt, d)).astype(np.float32)
    mask_a = np.zeros((b, la), bool); mask_a[1, 4:] = True
    mask_t = np.zeros((b, lt), bool); mask_t[0, 3:] = True

    l1, b1, _ = model(jnp.asarray(h_a), jnp.asarray(h_t),
                      jnp.asarray(mask_a), jnp.asarray(mask_t))

    # bucket both modalities up to larger static lengths with PAD tails
    def grow(x, mask, new_len):
        pad = new_len - x.shape[1]
        x2 = np.concatenate([x, np.zeros((b, pad, d), np.float32)], axis=1)
        m2 = np.concatenate([mask, np.ones((b, pad), bool)], axis=1)
        return x2, m2

    # NOTE: fusion length follows the TEXT length, so growing the text
    # bucket changes the fused sequence; padded fused positions are PAD in
    # the fused mask, and the decoder must ignore them.
    h_a2, mask_a2 = grow(h_a, mask_a, 12)
    h_t2, mask_t2 = grow(h_t, mask_t, 9)
    l2, b2, _ = model(jnp.asarray(h_a2), jnp.asarray(h_t2),
                      jnp.asarray(mask_a2), jnp.asarray(mask_t2))
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=1e-4)
    np.testing.assert_allclose(np.asarray(b1), np.asarray(b2), atol=1e-4)


def test_wavlm_padding_semantics_match_hf():
    """WavLM is NOT pad-content invariant — its layer-0 GroupNorm
    normalises each channel over the FULL padded length, so pad content
    (and even zero-pad length) shifts every frame. This matches HF exactly
    (which is why the reference pads every clip to a fixed 10 s,
    extract_audio_feats_wavlm_seq.py:81-87). Pin the parity: our leak
    equals the HF torch model's leak on the same garbage input.
    """
    import torch
    from transformers import WavLMConfig as HFW, WavLMModel

    from hriemo.frontends import WavLMConfig, WavLMEncoder

    torch.manual_seed(0)
    hf_cfg = HFW(hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
                 intermediate_size=64, conv_dim=(16, 16, 16), conv_kernel=(10, 3, 2),
                 conv_stride=(5, 2, 2), num_conv_pos_embeddings=16,
                 num_conv_pos_embedding_groups=4, num_buckets=40,
                 max_bucket_distance=100, feat_extract_norm="group",
                 do_stable_layer_norm=False, hidden_dropout=0.0,
                 activation_dropout=0.0, attention_dropout=0.0,
                 feat_proj_dropout=0.0, layerdrop=0.0, mask_time_prob=0.0,
                 mask_feature_prob=0.0, conv_bias=False)
    tmodel = WavLMModel(hf_cfg).eval()
    jmodel = WavLMEncoder(WavLMConfig.tiny()).from_torch_state_dict(tmodel.state_dict())

    rng = np.random.default_rng(5)
    t = 900
    wav = rng.standard_normal((2, t)).astype(np.float32) * 0.1
    mask = np.zeros((2, t), np.int64)
    mask[0, :] = 1
    mask[1, :500] = 1
    # garbage in the padded region leaks through GroupNorm stats — in BOTH
    # implementations identically
    wav2 = np.where(mask == 0, rng.standard_normal((2, t)).astype(np.float32) * 5, wav)
    with torch.no_grad():
        t_out = tmodel(input_values=torch.tensor(wav2),
                       attention_mask=torch.tensor(mask)).last_hidden_state.numpy()
    j_out, fm = jmodel(jnp.asarray(wav2), jnp.asarray(mask))
    n_valid = int(np.asarray(fm)[1].sum())
    np.testing.assert_allclose(np.asarray(j_out)[1, :n_valid],
                               t_out[1, :n_valid], atol=2e-4)
    # and the deterministic property that DOES hold: identical padded input
    # → identical output
    j_out_again, _ = jmodel(jnp.asarray(wav2), jnp.asarray(mask))
    np.testing.assert_array_equal(np.asarray(j_out), np.asarray(j_out_again))
