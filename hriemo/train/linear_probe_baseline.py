#!/usr/bin/env python3
"""Linear probe on concatenated utterance features
(reference: scripts/iemocap_feature_extraction_utter_level/linear_probe_baseline.py).

Contract: a single Linear on ``[audio; text]`` (2×768 = 1536-d by default,
or one modality via --modality), robust label/split normalisation, 10
epochs AdamW lr 1e-3, accuracy + macro-F1 reported per split.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp
import optax


def normalize_label(lab: str) -> str:
    """Robust label canonicalisation (reference :50-74)."""
    lab = str(lab).strip().lower()
    aliases = {"ang": "angry", "hap": "happy", "exc": "excited", "neu": "neutral",
               "fru": "frustration", "frustrated": "frustration", "sadness": "sad"}
    return aliases.get(lab, lab)


def normalize_split(s: str) -> str:
    s = str(s).strip().lower()
    return {"validation": "val", "valid": "val", "dev": "val",
            "testing": "test", "training": "train"}.get(s, s)


def load_xy(df, audio_dir, text_dir, modality, label2id):
    from ..data.datasets import UtterLevelDataset

    ds = UtterLevelDataset(df, audio_dir, text_dir, label2id=label2id, verbose=False)
    if len(ds) == 0:
        return np.zeros((0, 0), np.float32), np.zeros((0,), np.int64)
    xs, ys = [], []
    for i in range(len(ds)):
        item = ds[i]
        if modality == "audio":
            x = item["h_a"]
        elif modality == "text":
            x = item["h_t"]
        else:
            x = np.concatenate([item["h_a"], item["h_t"]])
        xs.append(x)
        ys.append(int(item["y"]))
    return np.stack(xs), np.asarray(ys, np.int64)


def macro_f1_from_preds(y_true, y_pred, n_classes):
    from ..utils.metrics import f1_binary

    return float(np.mean([
        f1_binary((y_true == c).astype(int), (y_pred == c).astype(int))
        for c in range(n_classes)
    ]))


def main(argv=None):
    import pandas as pd

    from ..data.datasets import build_label2id
    from .common import maybe_synthetic_iemocap, set_seed

    ap = argparse.ArgumentParser()
    ap.add_argument("--index_csv", type=str, default="data/iemocap_index_splits.csv")
    ap.add_argument("--audio_dir", type=str, default="features/utter_level/audio")
    ap.add_argument("--text_dir", type=str, default="features/utter_level/text")
    ap.add_argument("--modality", choices=["audio", "text", "concat"], default="concat")
    ap.add_argument("--label_col", type=str, default="label")
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--weight_decay", type=float, default=0.0)
    ap.add_argument("--batch_size", type=int, default=64)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--d_model", type=int, default=768)  # for --synthetic
    ap.add_argument("--out_dir", type=str, default="runs/linear_probe")
    ap.add_argument("--synthetic", type=int, default=0)
    args = ap.parse_args(argv)
    set_seed(args.seed)
    args = maybe_synthetic_iemocap(args, seq_level=False)

    df = pd.read_csv(args.index_csv)
    df[args.label_col] = df[args.label_col].map(normalize_label)
    df["split"] = df["split"].map(normalize_split)
    label2id = build_label2id(df[args.label_col])  # all rows, like the reference
    n_classes = len(label2id)

    data = {
        split: load_xy(df[df["split"] == split], args.audio_dir, args.text_dir,
                       args.modality, label2id)
        for split in ("train", "val", "test")
    }
    x_train, y_train = data["train"]
    d_in = x_train.shape[1]

    key = jax.random.key(args.seed)
    params = {
        "weight": jax.random.normal(key, (n_classes, d_in)) * (1.0 / np.sqrt(d_in)),
        "bias": jnp.zeros((n_classes,)),
    }
    tx = optax.adamw(args.lr, weight_decay=args.weight_decay)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, x, y):
        def loss_fn(p):
            logits = x @ p["weight"].T + p["bias"]
            logp = jax.nn.log_softmax(logits)
            return -jnp.mean(jnp.take_along_axis(logp, y[:, None], axis=-1))
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.default_rng(args.seed)
    bs = min(args.batch_size, len(x_train))
    for epoch in range(args.epochs):
        order = rng.permutation(len(x_train))
        for i in range(0, len(order) - bs + 1, bs):
            idx = order[i : i + bs]
            params, opt_state, loss = step(params, opt_state,
                                           jnp.asarray(x_train[idx]),
                                           jnp.asarray(y_train[idx]))

    results = {}
    for split, (x, y) in data.items():
        if len(x) == 0:
            continue
        logits = np.asarray(jnp.asarray(x) @ params["weight"].T + params["bias"])
        preds = logits.argmax(-1)
        results[split] = {
            "acc": float((preds == y).mean()),
            "macro_f1": macro_f1_from_preds(y, preds, n_classes),
            "n": int(len(y)),
        }
        print(f"[{args.modality}] {split}: acc={results[split]['acc']:.4f} "
              f"macro_f1={results[split]['macro_f1']:.4f} (n={len(y)})")

    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    with open(out_dir / "metrics.json", "w") as f:
        json.dump({"modality": args.modality, "label2id": label2id, **results}, f, indent=2)
    return results


if __name__ == "__main__":
    main()
