"""Torch-checkpoint bridge round-trips and reference-layout compatibility."""

import numpy as np
import pytest
import torch
import jax.numpy as jnp

from hriemo.models import MoseiFusionWithEmotionDecoder
from hriemo.utils import checkpoint as C


@pytest.fixture
def model():
    return MoseiFusionWithEmotionDecoder(
        d_audio=8, d_text=12, d_model=32, num_emotions=6, n_heads=4,
        num_layers_fusion=1, num_layers_decoder=1, beta_hidden=16,
    )


def _inputs(seed=0):
    rng = np.random.default_rng(seed)
    return (
        jnp.asarray(rng.standard_normal((2, 5, 8), dtype=np.float32)),
        jnp.asarray(rng.standard_normal((2, 4, 12), dtype=np.float32)),
    )


def test_reference_layout_roundtrip(tmp_path, model):
    """Save in the reference's best_*.pt layout, reload, identical logits."""
    h_a, h_t = _inputs()
    logits0, _, _ = model(h_a, h_t)

    ckpt = {
        "model_state_dict": C.state_dict_from_params(model.params),
        "args": {"d_model": 32, "n_heads": 4, "loss_type": "multi_label"},
        "emo_cols": ["emo_happy", "emo_sad", "emo_anger", "emo_fear", "emo_disgust", "emo_surprise"],
        "epoch": 3,
        "val_macro_auc": 0.7,
        "val_calibrated_thresholds": [0.05, 0.05, 0.15, 0.2, 0.25, 0.35],
    }
    path = str(tmp_path / "best_mosei_fusion_decoder.pt")
    C.save_torch_checkpoint(path, ckpt)

    # the file is a plain torch checkpoint
    raw = torch.load(path, map_location="cpu", weights_only=False)
    assert isinstance(raw["model_state_dict"]["audio_proj.weight"], torch.Tensor)
    assert raw["args"]["d_model"] == 32

    model2 = MoseiFusionWithEmotionDecoder(
        d_audio=8, d_text=12, d_model=32, num_emotions=6, n_heads=4,
        num_layers_fusion=1, num_layers_decoder=1, beta_hidden=16, seed=123,
    )
    ckpt2 = C.load_model_from_torch_checkpoint(model2, path)
    assert ckpt2["val_calibrated_thresholds"] == [0.05, 0.05, 0.15, 0.2, 0.25, 0.35]
    logits2, _, _ = model2(h_a, h_t)
    np.testing.assert_allclose(np.asarray(logits2), np.asarray(logits0), atol=1e-6)


def test_mismatched_state_dict_raises(model):
    sd = C.state_dict_from_params(model.params)
    del sd["audio_proj.weight"]
    with pytest.raises(KeyError):
        C.params_from_state_dict(sd, like=model.params)


def test_native_checkpoint_roundtrip(tmp_path, model):
    path = str(tmp_path / "native_ckpt")
    C.save_native(path, model.params)
    restored = C.restore_native(path, like=model.params)
    h_a, h_t = _inputs(seed=1)
    l0, _, _ = model.apply(model.params, h_a, h_t)
    l1, _, _ = model.apply(restored, h_a, h_t)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l0), atol=0)
