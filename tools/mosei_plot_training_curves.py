#!/usr/bin/env python3
"""Training-curve plots from outputs/train_log.csv
(reference: tools/mosei_plot_training_curves.py — which expected a CSV no
reference trainer wrote; hriemo trainers emit it for real)."""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import pandas as pd

    ap = argparse.ArgumentParser()
    ap.add_argument("--log_csv", type=str, default="outputs/train_log.csv")
    ap.add_argument("--out", type=str, default="figs/training_curves.png")
    args = ap.parse_args(argv)

    df = pd.read_csv(args.log_csv)
    fig, axes = plt.subplots(1, 3, figsize=(13, 4))
    axes[0].plot(df["epoch"], df["train_loss"], label="train")
    if "val_loss" in df:
        axes[0].plot(df["epoch"], df["val_loss"], label="val")
    axes[0].set_title("loss"); axes[0].legend()
    metric_col = "val_auc" if "val_auc" in df else "val_acc"
    axes[1].plot(df["epoch"], df[metric_col])
    axes[1].set_title(metric_col)
    axes[2].plot(df["epoch"], df["mean_beta"])
    axes[2].set_title("mean β")
    for ax in axes:
        ax.set_xlabel("epoch")
    fig.tight_layout()
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(out, dpi=120)
    print(f"[Saved] {out}")
    return out


if __name__ == "__main__":
    main()
