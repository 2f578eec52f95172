#!/usr/bin/env python3
"""MOSEI flagship trainer — TPU-native rebuild of the reference pipeline
(reference: scripts/fusion/train_mosei_fusion_seq_level_decoder.py).

Behavioral contract preserved: CLI flags, per-class pos_weight BCE computed
on the train split, cosine LR + linear warmup, gradient accumulation,
β-entropy regularizer, clamp(y,0,3)/3 label normalisation, center-crop caps,
NaN guards, micro/macro-F1 + macro-AUC with >0 binarisation, per-class
threshold calibration, --select_by checkpoint selection, and the
``best_mosei_fusion_decoder.pt`` checkpoint layout (state dict + args +
emo_cols + metrics + optional calibrated thresholds).

TPU-native replacements: bf16 compute instead of AMP/GradScaler, one
pjit-compiled update (grad-accum lax.scan inside), fixed-bucket batching
(single XLA compile), double-buffered device feed, optional (data × model)
mesh sharding, and a real ``outputs/train_log.csv``.

Run with ``--synthetic 64`` for a data-free smoke train.
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp


def parse_args(argv=None):
    ap = argparse.ArgumentParser()
    # data paths
    ap.add_argument("--index_csv", type=str, default="data/mosei_index_splits.csv")
    ap.add_argument("--audio_dir", type=str, default="features/mosei/seq_level/audio")
    ap.add_argument("--text_dir", type=str, default="features/mosei/seq_level/text")
    # CSV columns
    ap.add_argument("--uid_col", type=str, default="uid")
    ap.add_argument("--video_col", type=str, default="video_id")
    ap.add_argument("--split_col", type=str, default="split")
    ap.add_argument("--emo_cols", nargs="+", default=[
        "emo_happy", "emo_sad", "emo_anger", "emo_fear", "emo_disgust", "emo_surprise"])
    # model config
    ap.add_argument("--d_model", type=int, default=256)
    ap.add_argument("--n_heads", type=int, default=4)
    ap.add_argument("--num_layers_fusion", type=int, default=2)
    ap.add_argument("--num_layers_decoder", type=int, default=2)
    ap.add_argument("--beta_hidden", type=int, default=128)
    ap.add_argument("--dropout", type=float, default=0.1)
    # training config
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--weight_decay", type=float, default=1e-2)
    ap.add_argument("--grad_accum", type=int, default=4)
    ap.add_argument("--warmup_ratio", type=float, default=0.1)
    ap.add_argument("--beta_entropy", type=float, default=1e-3)
    # sequence caps
    ap.add_argument("--max_len_audio", type=int, default=300)
    ap.add_argument("--max_len_text", type=int, default=128)
    # selection & IO
    ap.add_argument("--select_by", type=str, default="macro_auc",
                    choices=["macro_auc", "macro_f1", "calibrated_macro_f1"])
    ap.add_argument("--save_calibrated_ths", action="store_true")
    ap.add_argument("--num_workers", type=int, default=2)  # accepted for CLI compat
    ap.add_argument("--out_dir", type=str, default="runs/mosei_fusion_decoder")
    ap.add_argument("--seed", type=int, default=1234)
    ap.add_argument("--max_train_samples", type=int, default=None)
    # TPU-native extensions
    ap.add_argument("--compute_dtype", type=str, default="bfloat16",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--n_data", type=int, default=None, help="mesh data-parallel ways")
    ap.add_argument("--n_model", type=int, default=1, help="mesh tensor-parallel ways")
    ap.add_argument("--synthetic", type=int, default=0,
                    help="generate N synthetic samples instead of real data")
    ap.add_argument("--native_ckpt", action="store_true",
                    help="also write an orbax checkpoint with optimizer state (resume)")
    ap.add_argument("--resume", action="store_true",
                    help="resume from out_dir/resume (params+optimizer+epoch); "
                         "a capability the reference lacks (SURVEY.md §5.4)")
    ap.add_argument("--trace_dir", type=str, default=None,
                    help="write a jax.profiler device trace of epoch 1 here")
    ap.add_argument("--native_loader", action="store_true",
                    help="use the C++ threaded batch assembler (native/)")
    return ap.parse_args(argv)


def evaluate(model, eval_step, params, loader):
    """Returns (loss, probs [N,C], y_raw [N,C], mean_beta)."""
    from ..data.batching import prefetch_to_device

    losses, probs, ys, betas = [], [], [], []
    for batch in prefetch_to_device(iter(loader)):
        n_valid = batch.pop("n_valid")
        batch.pop("uids", None)
        loss, logits, beta = eval_step(params, batch)
        losses.append(float(loss))
        probs.append(np.asarray(jax.nn.sigmoid(logits))[:n_valid])
        ys.append(np.asarray(batch["y"])[:n_valid])
        betas.append(np.asarray(beta)[:n_valid])
    probs = np.concatenate(probs)
    ys = np.concatenate(ys)
    mean_beta = float(np.concatenate(betas).mean())
    return float(np.mean(losses)), probs, ys, mean_beta


def main(argv=None):
    import pandas as pd

    from ..data import BucketBatcher, SeqLevelDataset
    from ..data.batching import prefetch_to_device
    from ..models import MoseiFusionWithEmotionDecoder
    from ..parallel import TrainConfig, create_train_state, make_eval_step, make_mesh, make_train_step
    from ..utils import checkpoint as C
    from ..utils import metrics as M
    from .common import TrainLogWriter, dropout_key, maybe_synthetic_mosei, set_seed

    args = parse_args(argv)
    set_seed(args.seed)
    args = maybe_synthetic_mosei(args)
    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    df = pd.read_csv(args.index_csv)
    train_df = df[df[args.split_col] == "train"]
    val_df = df[df[args.split_col] == "val"]
    if args.max_train_samples:
        train_df = train_df.iloc[: args.max_train_samples]

    mk_ds = lambda d: SeqLevelDataset(
        d, args.audio_dir, args.text_dir, uid_col=args.uid_col,
        emo_cols=args.emo_cols, max_len_audio=args.max_len_audio,
        max_len_text=args.max_len_text,
    )
    train_ds, val_ds = mk_ds(train_df), mk_ds(val_df)

    # per-class pos_weight on the TRAIN split (reference :567-569)
    y_train = train_ds.df[args.emo_cols].to_numpy(np.float32)
    pos_weight = M.pos_weights(M.binarize_truth(y_train))
    print("[pos_weight]", dict(zip(args.emo_cols, np.round(pos_weight, 2))))

    # feature dims from meta.json (reference :544-561)
    from ..data.feature_store import hidden_dim_from_meta, read_meta
    d_audio = hidden_dim_from_meta(read_meta(args.audio_dir))
    d_text = hidden_dim_from_meta(read_meta(args.text_dir))

    model = MoseiFusionWithEmotionDecoder(
        d_audio=d_audio, d_text=d_text, d_model=args.d_model,
        num_emotions=len(args.emo_cols), n_heads=args.n_heads,
        num_layers_fusion=args.num_layers_fusion,
        num_layers_decoder=args.num_layers_decoder,
        beta_hidden=args.beta_hidden, dropout=args.dropout,
    )

    # bucket lengths: training caps (or corpus max when uncapped, one pass)
    la, lt = args.max_len_audio, args.max_len_text
    if not la or not lt:
        las, lts = zip(*((it["h_a"].shape[0], it["h_t"].shape[0])
                         for it in (train_ds[i] for i in range(len(train_ds)))))
        la = la or max(las)
        lt = lt or max(lts)

    train_loader = BucketBatcher(train_ds, args.batch_size, la=la, lt=lt,
                                 shuffle=True, seed=args.seed,
                                 grad_accum=args.grad_accum, drop_last=True,
                                 native=args.native_loader)
    val_loader = BucketBatcher(val_ds, args.batch_size, la=la, lt=lt,
                               drop_last=False, native=args.native_loader)

    steps_per_epoch = max(1, len(train_loader))
    total_steps = steps_per_epoch * args.epochs
    cfg = TrainConfig(
        loss_type="multi_label", pos_weight=pos_weight,
        beta_entropy=args.beta_entropy, normalize_labels=True,
        lr=args.lr, weight_decay=args.weight_decay, grad_clip=5.0,
        grad_accum=args.grad_accum,
        warmup_steps=int(args.warmup_ratio * total_steps),
        total_steps=total_steps,
        compute_dtype=jnp.bfloat16 if args.compute_dtype == "bfloat16" else jnp.float32,
    )

    mesh = None
    if args.n_data or args.n_model > 1:
        mesh = make_mesh(n_data=args.n_data, n_model=args.n_model)
        print(f"[mesh] {dict(mesh.shape)}")

    state = create_train_state(model, cfg, rng=jax.random.key(args.seed), mesh=mesh)
    train_step = make_train_step(model, cfg, mesh=mesh)
    eval_step = make_eval_step(model, cfg, mesh=mesh)

    start_epoch, resume_meta = 1, {}
    resume_dir = out_dir / "resume"
    if args.resume and (resume_dir / "state").exists():
        state = C.restore_native(str(resume_dir / "state"), like=state)
        resume_meta = json.loads((resume_dir / "meta.json").read_text())
        start_epoch = int(resume_meta.get("epoch", 0)) + 1
        print(f"[resume] restored step={int(state.step)}, continuing at epoch {start_epoch}")

    log = TrainLogWriter(out_dir / "outputs" / "train_log.csv",
                         ["epoch", "train_loss", "val_loss", "val_auc", "mean_beta",
                          "val_macro_f1", "val_cal_macro_f1", "epoch_time_s"])

    best_metric = resume_meta.get("best_metric", -1.0)
    best_params, best_pack = None, resume_meta.get("best_pack", {})
    if args.resume and (resume_dir / "best_params").exists():
        best_params = C.restore_native(
            str(resume_dir / "best_params"),
            like=jax.tree_util.tree_map(np.asarray, state.params))

    from ..utils.profiling import trace as profiler_trace

    for epoch in range(start_epoch, args.epochs + 1):
        t0 = time.time()
        tr_losses, tr_betas = [], []
        with profiler_trace(args.trace_dir if epoch == start_epoch else None):
            for i, batch in enumerate(prefetch_to_device(iter(train_loader))):
                batch.pop("n_valid"); batch.pop("uids", None)
                state, metrics = train_step(state, batch, jax.random.fold_in(dropout_key(args.seed), epoch * 100000 + i))
                tr_losses.append(metrics["loss"])
                tr_betas.append(metrics["mean_beta"])
        tr_loss = float(np.mean([float(l) for l in tr_losses])) if tr_losses else 0.0
        tr_beta = float(np.mean([float(b) for b in tr_betas])) if tr_betas else 0.0

        va_loss, probs, ys, va_beta = evaluate(model, eval_step, state.params, val_loader)
        y_bin = M.binarize_truth(ys)
        va_micro = M.micro_f1(y_bin, (probs >= 0.5).astype(int))
        va_macro = M.macro_f1(y_bin, (probs >= 0.5).astype(int))
        va_auc = M.macro_auc(y_bin, probs)
        cal_ths, cal_f1 = M.calibrate_thresholds(y_bin, probs)
        va_cal_macro = float(np.mean(cal_f1))
        dt = time.time() - t0

        print(f"=== Epoch {epoch}/{args.epochs} ({dt:.1f}s) ===")
        print(f"Train Loss: {tr_loss:.4f} | Mean β: {tr_beta:.3f}  ||  "
              f"Val Loss: {va_loss:.4f} | F1 micro/macro: {va_micro:.3f}/{va_macro:.3f} | "
              f"AUC macro: {va_auc:.3f} | cal-F1 macro: {va_cal_macro:.3f} | Mean β: {va_beta:.3f}")
        log.append(epoch=epoch, train_loss=tr_loss, val_loss=va_loss,
                   val_auc=va_auc, mean_beta=va_beta, val_macro_f1=va_macro,
                   val_cal_macro_f1=va_cal_macro, epoch_time_s=round(dt, 2))

        current = {"macro_auc": va_auc, "macro_f1": va_macro,
                   "calibrated_macro_f1": va_cal_macro}[args.select_by]
        if np.isnan(current):
            current = -1.0
        if current > best_metric:
            best_metric = current
            best_params = jax.tree_util.tree_map(np.asarray, state.params)
            best_pack = {
                "epoch": epoch, "val_macro_auc": va_auc, "val_macro_f1": va_macro,
                "val_calibrated_macro_f1": va_cal_macro,
                "val_calibrated_thresholds": cal_ths.tolist(),
            }
            if args.resume or args.native_ckpt:
                C.save_native(str(resume_dir / "best_params"), best_params)

        if args.resume or args.native_ckpt:
            C.save_native(str(resume_dir / "state"), state)
            resume_dir.mkdir(parents=True, exist_ok=True)
            (resume_dir / "meta.json").write_text(json.dumps({
                "epoch": epoch, "best_metric": best_metric, "best_pack": best_pack,
            }))

    if best_params is None:  # e.g. resumed past --epochs with no stored best
        best_params = jax.tree_util.tree_map(np.asarray, state.params)

    # checkpoint in the reference layout (reference :616-642)
    ckpt = {
        "model_state_dict": C.state_dict_from_params(best_params),
        "args": vars(args),
        "emo_cols": args.emo_cols,
        **{k: v for k, v in best_pack.items() if k != "val_calibrated_thresholds"},
    }
    if args.save_calibrated_ths:
        ckpt["val_calibrated_thresholds"] = best_pack.get("val_calibrated_thresholds")
    ckpt_path = out_dir / "best_mosei_fusion_decoder.pt"
    C.save_torch_checkpoint(str(ckpt_path), ckpt)
    C.write_meta_json(str(out_dir / "meta.json"), {
        "model": "MoseiFusionWithEmotionDecoder",
        "select_by": args.select_by, "best_metric": best_metric, **best_pack,
    })
    if args.native_ckpt:
        C.save_native(str(out_dir / "native_state"), state.params)
    print(f"[Saved] {ckpt_path} (best {args.select_by}={best_metric:.4f})")
    return best_metric


if __name__ == "__main__":
    main()
