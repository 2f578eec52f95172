#!/usr/bin/env python3
"""Text-only baseline: linear or 1-hidden-layer MLP head over utterance
text features (reference: scripts/iemocap_feature_extraction_utter_level/train_text_baseline.py).

Contract: ``--head {linear, mlp}``, best model selected on val macro-F1,
``metrics.json`` written (reference :136-139).
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp
import optax

from .linear_probe_baseline import load_xy, macro_f1_from_preds, normalize_label, normalize_split


def main(argv=None):
    import pandas as pd

    from ..data.datasets import build_label2id
    from .common import dropout_key, maybe_synthetic_iemocap, set_seed

    ap = argparse.ArgumentParser()
    ap.add_argument("--index_csv", type=str, default="data/iemocap_index_splits.csv")
    ap.add_argument("--audio_dir", type=str, default="features/utter_level/audio")
    ap.add_argument("--text_dir", type=str, default="features/utter_level/text")
    ap.add_argument("--head", choices=["linear", "mlp"], default="mlp")
    ap.add_argument("--hidden", type=int, default=256)
    ap.add_argument("--label_col", type=str, default="label")
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--batch_size", type=int, default=64)
    ap.add_argument("--dropout", type=float, default=0.1)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--d_model", type=int, default=768)  # for --synthetic
    ap.add_argument("--out_dir", type=str, default="runs/text_baseline")
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
                       "text", label2id)
        for split in ("train", "val", "test")
    }
    x_train, y_train = data["train"]
    d_in = x_train.shape[1]

    keys = jax.random.split(jax.random.key(args.seed), 3)
    if args.head == "mlp":
        params = {
            "w1": jax.random.normal(keys[0], (args.hidden, d_in)) / np.sqrt(d_in),
            "b1": jnp.zeros((args.hidden,)),
            "w2": jax.random.normal(keys[1], (n_classes, args.hidden)) / np.sqrt(args.hidden),
            "b2": jnp.zeros((n_classes,)),
        }

        def forward(p, x, key=None):
            h = jax.nn.relu(x @ p["w1"].T + p["b1"])
            if key is not None and args.dropout > 0:
                keep = 1.0 - args.dropout
                h = jnp.where(jax.random.bernoulli(key, keep, h.shape), h / keep, 0.0)
            return h @ p["w2"].T + p["b2"]
    else:
        params = {
            "w": jax.random.normal(keys[0], (n_classes, d_in)) / np.sqrt(d_in),
            "b": jnp.zeros((n_classes,)),
        }

        def forward(p, x, key=None):
            return x @ p["w"].T + p["b"]

    tx = optax.adamw(args.lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, x, y, key):
        def loss_fn(p):
            logp = jax.nn.log_softmax(forward(p, x, key))
            return -jnp.mean(jnp.take_along_axis(logp, y[:, None], axis=-1))
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    def evaluate(p, split):
        x, y = data[split]
        if len(x) == 0:
            return {"acc": 0.0, "macro_f1": 0.0, "n": 0}
        preds = np.asarray(forward(p, jnp.asarray(x)).argmax(-1))
        return {"acc": float((preds == y).mean()),
                "macro_f1": macro_f1_from_preds(y, preds, n_classes),
                "n": int(len(y))}

    rng = np.random.default_rng(args.seed)
    best_f1, best_params = -1.0, params
    bs = min(args.batch_size, len(x_train))
    for epoch in range(args.epochs):
        order = rng.permutation(len(x_train))
        for i in range(0, len(order) - bs + 1, bs):
            idx = order[i : i + bs]
            params, opt_state, _ = step(
                params, opt_state, jnp.asarray(x_train[idx]), jnp.asarray(y_train[idx]),
                jax.random.fold_in(dropout_key(args.seed), epoch * 10000 + i))
        val = evaluate(params, "val")
        if val["macro_f1"] > best_f1:  # select on val macro-F1 (reference)
            best_f1 = val["macro_f1"]
            best_params = jax.tree_util.tree_map(np.asarray, params)

    results = {split: evaluate(best_params, split) for split in ("train", "val", "test")}
    for split, r in results.items():
        print(f"[text/{args.head}] {split}: acc={r['acc']:.4f} macro_f1={r['macro_f1']:.4f}")

    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    with open(out_dir / "metrics.json", "w") as f:
        json.dump({"head": args.head, "best_val_macro_f1": best_f1,
                   "label2id": label2id, **results}, f, indent=2)
    return results


if __name__ == "__main__":
    main()
