#!/usr/bin/env python3
"""MOSEI inference engine (reference: scripts/infer/mosei_eval_infer.py).

Artifact contract preserved per split:
  * ``{split}_y_prob.npy`` — sigmoid probabilities [N, C];
  * ``{split}_y_true.npy`` — raw-scale labels [N, C] (when the index has
    labels);
  * ``--dump_beta`` → ``{split}_beta_mean.npy`` — β reduced to a scalar per
    sample (mean when the gate is a vector, reference :241-247);
  * ``--dump_attn`` → ``{split}_attentions.pt`` =
    ``{"encoder": [batch][layer]{4 maps}, "decoder": [batch][layer][B,E,L]}``
    capped at ``--attn_max_samples`` (reference :165-229);
  * hyperparameters are **overridden from ckpt["args"]** (reference :316-324);
  * feature dims come from each dir's meta.json (reference :47-53).

TPU-native: the no-attention path runs the bf16 flash-fused forward with
double-buffered feed; the attention-dump path switches to the
weights-materialising forward (dual-path requirement).
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

MODEL_ARG_KEYS = ("d_model", "n_heads", "num_layers_fusion", "num_layers_decoder",
                  "beta_hidden", "dropout", "max_len_audio", "max_len_text", "emo_cols")


def parse_args(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", type=str, required=True)
    ap.add_argument("--index_csv", type=str, default="data/mosei_index_splits.csv")
    ap.add_argument("--audio_dir", type=str, default="features/mosei/seq_level/audio")
    ap.add_argument("--text_dir", type=str, default="features/mosei/seq_level/text")
    ap.add_argument("--uid_col", type=str, default=None)
    ap.add_argument("--split_col", type=str, default="split")
    ap.add_argument("--splits", nargs="+", default=["val", "test"])
    ap.add_argument("--emo_cols", nargs="+", default=[
        "emo_happy", "emo_sad", "emo_anger", "emo_fear", "emo_disgust", "emo_surprise"])
    ap.add_argument("--batch_size", type=int, default=16)
    ap.add_argument("--max_len_audio", type=int, default=300)
    ap.add_argument("--max_len_text", type=int, default=128)
    ap.add_argument("--d_model", type=int, default=256)
    ap.add_argument("--n_heads", type=int, default=4)
    ap.add_argument("--num_layers_fusion", type=int, default=2)
    ap.add_argument("--num_layers_decoder", type=int, default=2)
    ap.add_argument("--beta_hidden", type=int, default=128)
    ap.add_argument("--dropout", type=float, default=0.2)
    ap.add_argument("--dump_beta", action="store_true")
    ap.add_argument("--dump_attn", action="store_true")
    ap.add_argument("--attn_max_samples", type=int, default=16)
    ap.add_argument("--amp_dtype", type=str, default="bf16", choices=["bf16", "fp16", "off"])
    ap.add_argument("--out_dir", type=str, default="outputs/mosei_infer")
    return ap.parse_args(argv)


def run_split(model, params, ds, split, args, out_dir: Path, compute_dtype):
    from ..data import BucketBatcher
    from ..data.batching import prefetch_to_device

    # uncapped (max_len == 0): bucket at the split's true maximum length
    la = args.max_len_audio or max(
        (ds[i]["h_a"].shape[0] for i in range(len(ds))), default=1)
    lt = args.max_len_text or max(
        (ds[i]["h_t"].shape[0] for i in range(len(ds))), default=1)
    loader = BucketBatcher(ds, args.batch_size, la=la, lt=lt, drop_last=False)

    cast_params = jax.tree_util.tree_map(lambda x: x.astype(compute_dtype), params)

    @jax.jit
    def fwd(p, h_a, h_t, mask_a, mask_t):
        logits, beta, _ = model.apply(p, h_a.astype(compute_dtype),
                                      h_t.astype(compute_dtype), mask_a, mask_t)
        return jax.nn.sigmoid(logits.astype(jnp.float32)), beta.astype(jnp.float32)

    def fwd_attn(h_a, h_t, mask_a, mask_t):
        # fp32 weights-materialising path for interpretability export
        # (uses the uncast fp32 params on purpose — exported maps stay fp32)
        logits, beta, _, pack = model.apply(params, h_a, h_t, mask_a, mask_t,
                                            return_attention=True)
        return jax.nn.sigmoid(logits), beta, pack

    probs, ys, betas = [], [], []
    attn_batches = {"encoder": [], "decoder": []}
    n_attn = 0
    for batch in prefetch_to_device(iter(loader)):
        n_valid = batch.pop("n_valid")
        batch.pop("uids", None)
        y = batch.pop("y", None)
        # probabilities ALWAYS come from the fast path so y_prob.npy is
        # identical with and without --dump_attn
        p, beta = fwd(cast_params, batch["h_a"], batch["h_t"],
                      batch["mask_a"], batch["mask_t"])
        if args.dump_attn and n_attn < args.attn_max_samples:
            _, _, pack = fwd_attn(batch["h_a"], batch["h_t"],
                                  batch["mask_a"], batch["mask_t"])
            take = min(n_valid, args.attn_max_samples - n_attn)
            enc = [{k: np.asarray(v)[:take] for k, v in layer.items()}
                   for layer in pack["encoder"]]
            dec = [np.asarray(m)[:take] for m in pack["decoder"]]
            attn_batches["encoder"].append(enc)
            attn_batches["decoder"].append(dec)
            n_attn += take
        probs.append(np.asarray(p)[:n_valid])
        if y is not None:
            ys.append(np.asarray(y)[:n_valid])
        betas.append(np.asarray(beta)[:n_valid].reshape(n_valid, -1).mean(axis=1))

    probs = np.concatenate(probs) if probs else np.zeros((0, len(args.emo_cols)))
    out_dir.mkdir(parents=True, exist_ok=True)
    np.save(out_dir / f"{split}_y_prob.npy", probs)
    if ys:
        np.save(out_dir / f"{split}_y_true.npy", np.concatenate(ys))
    if args.dump_beta:
        np.save(out_dir / f"{split}_beta_mean.npy", np.concatenate(betas))
    if args.dump_attn:
        import torch

        def to_t(x):
            if isinstance(x, dict):
                return {k: to_t(v) for k, v in x.items()}
            if isinstance(x, list):
                return [to_t(v) for v in x]
            return torch.tensor(np.asarray(x))

        torch.save(to_t(attn_batches), out_dir / f"{split}_attentions.pt")
    print(f"[{split}] wrote {len(probs)} samples to {out_dir}")
    return probs


def main(argv=None):
    import pandas as pd

    from ..data import SeqLevelDataset
    from ..data.feature_store import hidden_dim_from_meta, read_meta
    from ..models import MoseiFusionWithEmotionDecoder
    from ..utils import checkpoint as C

    args = parse_args(argv)

    ckpt = C.load_torch_checkpoint(args.ckpt)
    # hyperparameter override from the checkpoint (reference :316-324)
    ck_args = ckpt.get("args", {})
    for key in MODEL_ARG_KEYS:
        if key in ck_args and ck_args[key] is not None:
            setattr(args, key, ck_args[key])

    d_audio = hidden_dim_from_meta(read_meta(args.audio_dir))
    d_text = hidden_dim_from_meta(read_meta(args.text_dir))

    model = MoseiFusionWithEmotionDecoder(
        d_audio=d_audio, d_text=d_text, d_model=args.d_model,
        num_emotions=len(args.emo_cols), n_heads=args.n_heads,
        num_layers_fusion=args.num_layers_fusion,
        num_layers_decoder=args.num_layers_decoder,
        beta_hidden=args.beta_hidden, dropout=args.dropout,
    )
    params = C.params_from_state_dict(ckpt["model_state_dict"], like=model.params)

    compute_dtype = {"bf16": jnp.bfloat16, "fp16": jnp.float16, "off": jnp.float32}[args.amp_dtype]

    df = pd.read_csv(args.index_csv)
    out_dir = Path(args.out_dir)
    for split in args.splits:
        sdf = df[df[args.split_col] == split]
        has_labels = all(c in df.columns for c in args.emo_cols)
        ds = SeqLevelDataset(
            sdf, args.audio_dir, args.text_dir, uid_col=args.uid_col,
            emo_cols=args.emo_cols if has_labels else None,
            max_len_audio=args.max_len_audio, max_len_text=args.max_len_text,
        )
        run_split(model, params, ds, split, args, out_dir, compute_dtype)
    return out_dir


if __name__ == "__main__":
    main()
