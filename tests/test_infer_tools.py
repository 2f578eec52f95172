"""Full artifact chain: train → infer → metrics → plots → tools.

One synthetic corpus flows through every CLI, checking the artifact names
and shapes the reference's downstream notebooks consume (SURVEY.md §2.4-2.5).
"""

import numpy as np
import pytest
import torch


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    from hriemo.train.train_mosei_fusion_seq_level_decoder import main as train_main

    root = tmp_path_factory.mktemp("chain")
    out = root / "run"
    train_main(["--synthetic", "48", "--epochs", "2", "--batch_size", "4",
                "--grad_accum", "1", "--d_model", "32", "--n_heads", "4",
                "--num_layers_fusion", "1", "--num_layers_decoder", "1",
                "--beta_hidden", "16", "--max_len_audio", "24", "--max_len_text", "12",
                "--compute_dtype", "float32", "--lr", "1e-3",
                "--save_calibrated_ths", "--out_dir", str(out)])
    return {
        "ckpt": str(out / "best_mosei_fusion_decoder.pt"),
        "index_csv": str(out / "synthetic_data" / "mosei_index_splits.csv"),
        "audio_dir": str(out / "synthetic_data" / "features" / "audio"),
        "text_dir": str(out / "synthetic_data" / "features" / "text"),
        "out": out,
        "root": root,
    }


def test_infer_artifacts(trained):
    from hriemo.infer.mosei_eval_infer import main as infer_main

    pred_dir = trained["root"] / "preds"
    infer_main(["--ckpt", trained["ckpt"], "--index_csv", trained["index_csv"],
                "--audio_dir", trained["audio_dir"], "--text_dir", trained["text_dir"],
                "--splits", "val", "test", "--batch_size", "4",
                "--dump_beta", "--dump_attn", "--attn_max_samples", "4",
                "--amp_dtype", "off", "--out_dir", str(pred_dir)])

    for split in ("val", "test"):
        probs = np.load(pred_dir / f"{split}_y_prob.npy")
        truth = np.load(pred_dir / f"{split}_y_true.npy")
        assert probs.shape == truth.shape and probs.shape[1] == 6
        assert (probs >= 0).all() and (probs <= 1).all()
        beta = np.load(pred_dir / f"{split}_beta_mean.npy")
        assert beta.shape == (probs.shape[0],)

    # attention dump structure: {"encoder": [batch][layer]{4 maps}, "decoder": ...}
    attn = torch.load(pred_dir / "val_attentions.pt", weights_only=False)
    assert set(attn) == {"encoder", "decoder"}
    first_layer = attn["encoder"][0][0]
    assert set(first_layer) == {"audio_self", "text_self",
                                "audio_queries_text", "text_queries_audio"}
    assert first_layer["audio_queries_text"].shape[-1] == 12  # [b, La, Lt]
    dec = attn["decoder"][0][0]
    assert dec.shape[1] == 6 and dec.shape[2] == 12  # [b, E, L_fused]


def test_summary_metrics_and_plots(trained):
    from hriemo.infer.mosei_eval_infer import main as infer_main
    from hriemo.infer.mosei_summary_metrics import main as summary_main
    from hriemo.infer.mosei_plot_metrics import main as plot_main

    pred_dir = trained["root"] / "preds2"
    infer_main(["--ckpt", trained["ckpt"], "--index_csv", trained["index_csv"],
                "--audio_dir", trained["audio_dir"], "--text_dir", trained["text_dir"],
                "--splits", "val", "--batch_size", "4", "--amp_dtype", "off",
                "--out_dir", str(pred_dir)])

    res = summary_main(["--pred_dir", str(pred_dir), "--split", "val",
                        "--ckpt", trained["ckpt"]])
    assert 0 <= res["micro_f1"] <= 1
    assert (pred_dir / "val_summary_metrics.csv").exists()

    out = plot_main(["--pred_dir", str(pred_dir), "--split", "val"])
    for f in ("per_class_f1.png", "per_class_ap.png", "combined_pr_curve.png",
              "overall_metrics.txt"):
        assert (out / f).exists()


def test_tools_chain(trained):
    import sys
    sys.path.insert(0, "tools")
    from hriemo.infer.mosei_eval_infer import main as infer_main
    import importlib

    pred_dir = trained["root"] / "preds3"
    infer_main(["--ckpt", trained["ckpt"], "--index_csv", trained["index_csv"],
                "--audio_dir", trained["audio_dir"], "--text_dir", trained["text_dir"],
                "--splits", "val", "--batch_size", "4", "--amp_dtype", "off",
                "--out_dir", str(pred_dir)])

    export = importlib.import_module("mosei_export_per_class_metrics")
    csv_path = export.main(["--pred_dir", str(pred_dir), "--ckpt", trained["ckpt"]])
    import pandas as pd
    dfm = pd.read_csv(csv_path)
    assert list(dfm.columns) == ["class", "auc", "auprc", "f1_at_0.5",
                                 "f1_at_calibrated", "threshold"]
    assert len(dfm) == 6

    plot_th = importlib.import_module("mosei_plot_thresholds")
    out = plot_th.main(["--ckpt", trained["ckpt"],
                        "--out", str(trained["root"] / "figs" / "th.png")])
    assert out.exists()

    plot_tc = importlib.import_module("mosei_plot_training_curves")
    out = plot_tc.main(["--log_csv", str(trained["out"] / "outputs" / "train_log.csv"),
                        "--out", str(trained["root"] / "figs" / "curves.png")])
    assert out.exists()


def test_plot_results_tool(trained):
    import sys
    sys.path.insert(0, "tools")
    import importlib
    from hriemo.infer.mosei_eval_infer import main as infer_main

    pred_dir = trained["root"] / "preds4"
    infer_main(["--ckpt", trained["ckpt"], "--index_csv", trained["index_csv"],
                "--audio_dir", trained["audio_dir"], "--text_dir", trained["text_dir"],
                "--splits", "val", "--batch_size", "4", "--amp_dtype", "off",
                "--dump_beta", "--dump_attn", "--attn_max_samples", "3",
                "--out_dir", str(pred_dir)])

    mod = importlib.import_module("mosei_plot_results")
    out = mod.main(["--pred_dir", str(pred_dir), "--split", "val",
                    "--ckpt", trained["ckpt"], "--max_attn_samples", "2"])
    for f in ("score_histograms.png", "label_correlation.png",
              "confusion_matrices.png", "beta_distribution.png",
              "attention_sample0.png", "case_study.txt"):
        assert (out / f).exists(), f


def test_infer_uncapped_lengths(trained):
    """max_len 0 must bucket at the corpus max, not crop to 1 (regression).

    The ckpt-args override supplies max_len, so strip it from a copy of the
    checkpoint to genuinely exercise the uncapped path.
    """
    import numpy as np
    from hriemo.infer.mosei_eval_infer import main as infer_main
    from hriemo.utils.checkpoint import load_torch_checkpoint, save_torch_checkpoint

    ckpt = load_torch_checkpoint(trained["ckpt"])
    ckpt["args"]["max_len_audio"] = 0
    ckpt["args"]["max_len_text"] = 0
    uncapped_ckpt = str(trained["root"] / "uncapped.pt")
    save_torch_checkpoint(uncapped_ckpt, ckpt)

    pred_dir = trained["root"] / "preds_uncapped"
    infer_main(["--ckpt", uncapped_ckpt, "--index_csv", trained["index_csv"],
                "--audio_dir", trained["audio_dir"], "--text_dir", trained["text_dir"],
                "--splits", "val", "--batch_size", "4", "--amp_dtype", "off",
                "--out_dir", str(pred_dir)])
    probs = np.load(pred_dir / "val_y_prob.npy")
    assert probs.shape[1] == 6 and np.isfinite(probs).all()
    # probabilities must not be degenerate (cropping to length 1 would
    # collapse them to near-identical rows)
    assert np.abs(probs - probs[0]).max() > 1e-4
