"""JAX frontends vs HF torch oracles (random-init small configs, offline).

The environment has no pretrained weights (zero egress), so parity is
proven against torch `BertModel(config)` / `WavLMModel(config)` with
random init — architecture + state-dict-bridge correctness; real weights
load through exactly the same path.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from hriemo.frontends import BertConfig, BertEncoder, WavLMConfig, WavLMEncoder

ATOL = 2e-4


# ------------------------------------------------------------------- BERT

@pytest.fixture(scope="module")
def bert_pair():
    from transformers import BertConfig as HFBertConfig, BertModel

    torch.manual_seed(0)
    hf_cfg = HFBertConfig(vocab_size=99, hidden_size=32, num_hidden_layers=2,
                          num_attention_heads=4, intermediate_size=64,
                          max_position_embeddings=64, type_vocab_size=2,
                          hidden_act="gelu", attention_probs_dropout_prob=0.0,
                          hidden_dropout_prob=0.0)
    tmodel = BertModel(hf_cfg).eval()
    jmodel = BertEncoder(BertConfig.tiny()).from_torch_state_dict(tmodel.state_dict())
    return tmodel, jmodel


def test_bert_parity(bert_pair):
    tmodel, jmodel = bert_pair
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 99, size=(3, 12))
    mask = np.ones((3, 12), np.int64)
    mask[1, 8:] = 0
    mask[2, 5:] = 0

    with torch.no_grad():
        tout = tmodel(input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask))
    jseq, jpool = jmodel(jnp.asarray(ids), jnp.asarray(mask))

    t_seq = tout.last_hidden_state.numpy()
    # compare only valid positions (HF computes garbage on padded ones too,
    # but ours may differ there; the contract is over valid tokens)
    for b in range(3):
        n = int(mask[b].sum())
        np.testing.assert_allclose(np.asarray(jseq)[b, :n], t_seq[b, :n], atol=ATOL)

    # pooled = masked mean of valid positions (the reference's pooling)
    ref_pool = np.stack([t_seq[b, : int(mask[b].sum())].mean(0) for b in range(3)])
    np.testing.assert_allclose(np.asarray(jpool), ref_pool, atol=ATOL)


def test_bert_token_types(bert_pair):
    tmodel, jmodel = bert_pair
    ids = np.arange(10)[None, :] % 99
    tt = (np.arange(10)[None, :] >= 5).astype(np.int64)
    with torch.no_grad():
        tout = tmodel(input_ids=torch.tensor(ids), token_type_ids=torch.tensor(tt))
    jseq, _ = jmodel(jnp.asarray(ids), token_type_ids=jnp.asarray(tt))
    np.testing.assert_allclose(np.asarray(jseq), tout.last_hidden_state.numpy(), atol=ATOL)


# ------------------------------------------------------------------ WavLM

@pytest.fixture(scope="module")
def wavlm_pair():
    from transformers import WavLMConfig as HFWavLMConfig, WavLMModel

    torch.manual_seed(1)
    hf_cfg = HFWavLMConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=64, conv_dim=(16, 16, 16), conv_kernel=(10, 3, 2),
        conv_stride=(5, 2, 2), num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4, num_buckets=40, max_bucket_distance=100,
        feat_extract_norm="group", do_stable_layer_norm=False,
        hidden_dropout=0.0, activation_dropout=0.0, attention_dropout=0.0,
        feat_proj_dropout=0.0, layerdrop=0.0, mask_time_prob=0.0,
        mask_feature_prob=0.0, conv_bias=False,
    )
    tmodel = WavLMModel(hf_cfg).eval()
    jmodel = WavLMEncoder(WavLMConfig.tiny()).from_torch_state_dict(tmodel.state_dict())
    return tmodel, jmodel


def test_wavlm_parity_no_mask(wavlm_pair):
    tmodel, jmodel = wavlm_pair
    rng = np.random.default_rng(2)
    wav = rng.standard_normal((2, 800)).astype(np.float32) * 0.1
    with torch.no_grad():
        tout = tmodel(input_values=torch.tensor(wav))
    jseq, jmask = jmodel(jnp.asarray(wav))
    assert jmask is None
    np.testing.assert_allclose(np.asarray(jseq), tout.last_hidden_state.numpy(), atol=ATOL)


def test_wavlm_parity_masked(wavlm_pair):
    tmodel, jmodel = wavlm_pair
    rng = np.random.default_rng(3)
    wav = rng.standard_normal((3, 800)).astype(np.float32) * 0.1
    mask = np.ones((3, 800), np.int64)
    mask[1, 500:] = 0
    mask[2, 300:] = 0
    with torch.no_grad():
        tout = tmodel(input_values=torch.tensor(wav), attention_mask=torch.tensor(mask))
    jseq, jmask = jmodel(jnp.asarray(wav), jnp.asarray(mask))

    # frame mask matches HF's conv-length downsampling
    t_frame_mask = tmodel._get_feature_vector_attention_mask(
        tout.last_hidden_state.shape[1], torch.tensor(mask)).numpy()
    np.testing.assert_array_equal(np.asarray(jmask).astype(bool), t_frame_mask)

    t_seq = tout.last_hidden_state.numpy()
    for b in range(3):
        n = int(t_frame_mask[b].sum())
        np.testing.assert_allclose(np.asarray(jseq)[b, :n], t_seq[b, :n], atol=ATOL,
                                   err_msg=f"sample {b}")


def test_wavlm_output_length_formula(wavlm_pair):
    tmodel, jmodel = wavlm_pair
    from hriemo.frontends.wavlm import feat_extract_output_lengths

    for t in (320, 800, 1234):
        want = int(tmodel._get_feat_extract_output_lengths(t))
        got = int(feat_extract_output_lengths(jmodel.config, jnp.asarray(t)))
        assert got == want, (t, got, want)


def test_wavlm_jits(wavlm_pair):
    import jax

    _, jmodel = wavlm_pair
    wav = jnp.zeros((2, 800))
    mask = jnp.ones((2, 800), jnp.int32)
    f = jax.jit(lambda p, w, m: jmodel.apply(p, w, m)[0])
    out = f(jmodel.params, wav, mask)
    assert np.isfinite(np.asarray(out)).all()
