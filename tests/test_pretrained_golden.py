"""CI coverage for tools/validate_pretrained_bridges.py (VERDICT r1 #8).

No pretrained weights are downloadable here (zero egress), so this drives
the golden-validation tool end-to-end with synthetic random-init HF state
dicts at tiny configs — the exact code path real weights will take —
including BOTH weight-norm naming schemes for WavLM's positional conv:

  * new torch (>=2.1 parametrize API): ``...parametrizations.weight.original0/1``
  * old torch: ``...weight_g`` / ``...weight_v``

(ref dependency: extract_audio_feats_wavlm.py:22 loads
``microsoft/wavlm-base-plus`` whose published state dict uses the old
names, while a locally re-saved model uses the new ones — the bridge must
accept both, wavlm.py:319-330.)
"""

import json

import numpy as np
import pytest
import torch

TINY_WAVLM = dict(
    hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
    intermediate_size=64, conv_dim=(16, 16, 16), conv_kernel=(10, 3, 2),
    conv_stride=(5, 2, 2), num_conv_pos_embeddings=16,
    num_conv_pos_embedding_groups=4, num_buckets=40, max_bucket_distance=100,
)
TINY_BERT = dict(
    vocab_size=99, hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
    intermediate_size=64, max_position_embeddings=64, type_vocab_size=2,
)


@pytest.fixture(scope="module")
def wavlm_sd():
    from transformers import WavLMConfig as HFWavLMConfig, WavLMModel

    torch.manual_seed(0)
    cfg = HFWavLMConfig(**TINY_WAVLM, feat_extract_norm="group",
                        do_stable_layer_norm=False, conv_bias=False,
                        hidden_dropout=0.0, activation_dropout=0.0,
                        attention_dropout=0.0, feat_proj_dropout=0.0,
                        layerdrop=0.0, mask_time_prob=0.0, mask_feature_prob=0.0)
    return WavLMModel(cfg).eval().state_dict()


def _swap_weight_norm_scheme(sd):
    """Produce the *other* naming scheme for the pos-conv weight norm."""
    out, swapped = {}, 0
    for k, v in sd.items():
        if "pos_conv_embed.conv.parametrizations.weight.original0" in k:
            out[k.replace("parametrizations.weight.original0", "weight_g")] = v
            swapped += 1
        elif "pos_conv_embed.conv.parametrizations.weight.original1" in k:
            out[k.replace("parametrizations.weight.original1", "weight_v")] = v
            swapped += 1
        elif "pos_conv_embed.conv.weight_g" in k:
            out[k.replace("weight_g", "parametrizations.weight.original0")] = v
            swapped += 1
        elif "pos_conv_embed.conv.weight_v" in k:
            out[k.replace("weight_v", "parametrizations.weight.original1")] = v
            swapped += 1
        else:
            out[k] = v
    assert swapped == 2, f"expected g+v pair, swapped {swapped}"
    return out


def test_both_weight_norm_schemes_load_identically(wavlm_sd):
    from hriemo.frontends import WavLMConfig, WavLMEncoder
    from hriemo.nn.module import flatten_params

    cfg = WavLMConfig.tiny()
    a = WavLMEncoder(cfg).from_torch_state_dict(wavlm_sd)
    b = WavLMEncoder(cfg).from_torch_state_dict(_swap_weight_norm_scheme(wavlm_sd))
    fa, fb = flatten_params(a.params), flatten_params(b.params)
    assert set(fa) == set(fb)
    for k in fa:
        np.testing.assert_allclose(np.asarray(fa[k]), np.asarray(fb[k]),
                                   atol=1e-6, err_msg=k)


def test_validate_tool_end_to_end(tmp_path, wavlm_sd):
    """Drives tools/validate_pretrained_bridges.py main() exactly as the
    runbook will with real weights: on-disk state dicts in, HF cross-check
    (≤2e-4), golden file out, then a passing --check-golden round trip."""
    from transformers import BertConfig as HFBertConfig, BertModel

    import tools.validate_pretrained_bridges as vt

    torch.manual_seed(1)
    bert_sd = BertModel(HFBertConfig(
        **TINY_BERT, hidden_act="gelu",
        attention_probs_dropout_prob=0.0, hidden_dropout_prob=0.0,
    )).eval().state_dict()

    wpath, bpath = tmp_path / "wavlm.bin", tmp_path / "bert.bin"
    torch.save(wavlm_sd, wpath)
    torch.save(bert_sd, bpath)
    out = tmp_path / "golden.json"

    wcfg = json.dumps(TINY_WAVLM)
    bcfg = json.dumps(TINY_BERT)
    rc = vt.main(["--wavlm", str(wpath), "--bert", str(bpath),
                  "--wavlm-config", wcfg, "--bert-config", bcfg,
                  "--out", str(out)])
    assert rc == 0
    golden = json.loads(out.read_text())
    assert golden["results"]["wavlm"]["hf_max_delta_valid"] <= 2e-4
    assert golden["results"]["bert"]["hf_max_delta_valid"] <= 2e-4
    assert golden["results"]["wavlm"]["fingerprint"]["shape"][0] == 3

    # regression round trip: re-run against the golden we just wrote
    rc = vt.main(["--wavlm", str(wpath), "--bert", str(bpath),
                  "--wavlm-config", wcfg, "--bert-config", bcfg,
                  "--check-golden", str(out)])
    assert rc == 0


def test_validate_tool_old_scheme_no_hf(tmp_path, wavlm_sd):
    """Old-naming state dict loads through the tool with --no-hf-compare
    (current HF torch can't load_state_dict the old names) and produces
    the SAME fingerprint as the new-naming dict — proving scheme
    equivalence through the full tool path."""
    import tools.validate_pretrained_bridges as vt

    old_sd = _swap_weight_norm_scheme(wavlm_sd)
    wnew, wold = tmp_path / "new.bin", tmp_path / "old.bin"
    torch.save(wavlm_sd, wnew)
    torch.save(old_sd, wold)
    cfg = json.dumps(TINY_WAVLM)

    out_new, out_old = tmp_path / "g_new.json", tmp_path / "g_old.json"
    assert vt.main(["--wavlm", str(wnew), "--wavlm-config", cfg,
                    "--no-hf-compare", "--out", str(out_new)]) == 0
    assert vt.main(["--wavlm", str(wold), "--wavlm-config", cfg,
                    "--no-hf-compare", "--out", str(out_old)]) == 0
    fp_new = json.loads(out_new.read_text())["results"]["wavlm"]["fingerprint"]
    fp_old = json.loads(out_old.read_text())["results"]["wavlm"]["fingerprint"]
    assert fp_new["sha256_r3"] == fp_old["sha256_r3"]
