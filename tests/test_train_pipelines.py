"""End-to-end smoke trains of all four pipelines on synthetic corpora.

Each test runs a real multi-epoch training (tiny shapes), checks that the
checkpoint artifact has the reference layout and that learning happens
(synthetic corpora carry a planted signal).
"""

import numpy as np
import pytest
import torch


TINY = ["--epochs", "3", "--batch_size", "4", "--d_model", "32", "--n_heads", "4",
        "--beta_hidden", "16", "--compute_dtype", "float32", "--lr", "1e-3"]


def test_mosei_flagship_pipeline(tmp_path):
    from hriemo.train.train_mosei_fusion_seq_level_decoder import main

    out = str(tmp_path / "run")
    best = main(["--synthetic", "48", "--grad_accum", "2",
                 "--num_layers_fusion", "1", "--num_layers_decoder", "1",
                 "--max_len_audio", "24", "--max_len_text", "12",
                 "--save_calibrated_ths", "--select_by", "calibrated_macro_f1",
                 "--out_dir", out] + TINY)
    assert best > 0.3

    ckpt = torch.load(f"{out}/best_mosei_fusion_decoder.pt", map_location="cpu",
                      weights_only=False)
    assert "model_state_dict" in ckpt and "args" in ckpt and "emo_cols" in ckpt
    assert len(ckpt["val_calibrated_thresholds"]) == 6
    assert ckpt["args"]["d_model"] == 32
    assert isinstance(ckpt["model_state_dict"]["audio_proj.weight"], torch.Tensor)

    # train_log.csv emitted for real (reference tools expect it)
    import pandas as pd
    log = pd.read_csv(f"{out}/outputs/train_log.csv")
    assert list(log.columns)[:5] == ["epoch", "train_loss", "val_loss", "val_auc", "mean_beta"]
    assert len(log) == 3


def test_iemocap_utter_pipeline(tmp_path):
    from hriemo.train.train_fusion_utter_level import main

    out = str(tmp_path / "run")
    best = main(["--synthetic", "64", "--num_layers", "1", "--out_dir", out] + TINY)
    # synthetic classes are linearly separable; must beat chance (1/6)
    assert best > 0.3

    ckpt = torch.load(f"{out}/best_fusion_utt.pt", map_location="cpu", weights_only=False)
    assert set(ckpt) >= {"model_state_dict", "args", "label2id", "epoch", "val_acc"}
    assert len(ckpt["label2id"]) == 6


def test_iemocap_seq_pipeline(tmp_path):
    from hriemo.train.train_fusion_seq_level import main

    out = str(tmp_path / "run")
    best = main(["--synthetic", "48", "--num_layers", "1",
                 "--max_len_audio", "24", "--max_len_text", "12",
                 "--out_dir", out] + TINY)
    assert best > 0.3
    ckpt = torch.load(f"{out}/best_fusion_seq.pt", map_location="cpu", weights_only=False)
    assert "label2id" in ckpt


@pytest.mark.parametrize("loss_type", ["single_label", "multi_label"])
def test_iemocap_seq_decoder_pipeline(tmp_path, loss_type):
    from hriemo.train.train_fusion_seq_level_decoder import main

    out = str(tmp_path / f"run_{loss_type}")
    best = main(["--synthetic", "48", "--loss_type", loss_type,
                 "--num_layers_fusion", "1", "--num_layers_decoder", "1",
                 "--max_len_audio", "24", "--max_len_text", "12",
                 "--out_dir", out] + TINY)
    assert best >= 0.0
    ckpt = torch.load(f"{out}/best_fusion_seq_decoder.pt", map_location="cpu",
                      weights_only=False)
    assert ckpt["args"]["loss_type"] == loss_type


def test_dropout_key_is_rbg():
    """The shipped per-step dropout stream is RBG (round 5: threefry
    bit-gen measured +45% ms/step on the TPU VPU — common.dropout_key
    docstring has the A/B numbers). Any valid stream is a correct
    dropout mask, but the impl choice is a measured serving decision,
    so pin it."""
    import jax
    from hriemo.train.common import dropout_key

    k = dropout_key(0)
    assert "rbg" in str(jax.random.key_impl(k))
    # the stream must survive the trainers' fold_in/split usage
    k2 = jax.random.fold_in(k, 7)
    assert jax.random.bernoulli(k2, 0.4, (8,)).shape == (8,)
