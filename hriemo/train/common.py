"""Shared training-pipeline utilities (the reference duplicates these per
script — SURVEY.md §2.3 'shared utilities duplicated per script')."""

from __future__ import annotations

import csv
import os
import random
from pathlib import Path

import numpy as np


def set_seed(seed: int) -> None:
    """Seed host-side RNGs (model init / shuffling use explicit JAX keys)."""
    random.seed(seed)
    np.random.seed(seed)


def dropout_key(seed: int):
    """Per-run base key for the training step's dropout stream.

    Uses the RBG bit generator instead of JAX's default threefry:
    dropout masks are semantically implementation-free (any valid
    stream is a correct Bernoulli mask — the reference's torch stream
    differs from every JAX impl anyway), and threefry bit generation is
    ALU-bound on the TPU VPU. Measured on the flagship MOSEI v2 step
    (real chip, round 5, .scratch/train_rng_ab.py, dropout=0.4):
    6.82 -> 4.71 ms/step at B=32 (+45% ex/s), 86.8 -> 68.9 at B=512
    (+26%); unsafe_rbg measured no faster than rbg. Param-init keys
    stay threefry (checkpoint/test determinism is worth keeping there;
    init cost is one-off)."""
    import jax

    return jax.random.key(seed, impl="rbg")


class TrainLogWriter:
    """Writes ``outputs/train_log.csv`` (epoch, train_loss, val_loss,
    val_auc, mean_beta, …).

    The reference's tools/mosei_plot_training_curves.py expects this file
    but no reference script ever writes it (SURVEY.md §5.5) — here it is
    emitted for real.
    """

    def __init__(self, path: str | Path, fields: list[str]):
        self.path = Path(path)
        self.fields = fields
        self.path.parent.mkdir(parents=True, exist_ok=True)
        with open(self.path, "w", newline="") as f:
            csv.DictWriter(f, fieldnames=fields).writeheader()

    def append(self, **row):
        with open(self.path, "a", newline="") as f:
            csv.DictWriter(f, fieldnames=self.fields).writerow(
                {k: row.get(k, "") for k in self.fields}
            )


def maybe_synthetic_mosei(args):
    """If --synthetic N is set, generate a corpus under out_dir and point
    the data flags at it."""
    if getattr(args, "synthetic", 0):
        from ..data.synthetic import make_synthetic_mosei

        root = Path(args.out_dir) / "synthetic_data"
        csv_path, audio_dir, text_dir = make_synthetic_mosei(
            root, n=args.synthetic, seed=args.seed
        )
        args.index_csv = str(csv_path)
        args.audio_dir = str(audio_dir)
        args.text_dir = str(text_dir)
    return args


def maybe_synthetic_iemocap(args, seq_level: bool):
    if getattr(args, "synthetic", 0):
        from ..data.synthetic import make_synthetic_iemocap

        root = Path(args.out_dir) / "synthetic_data"
        csv_path, audio_dir, text_dir = make_synthetic_iemocap(
            root, n=args.synthetic, d=args.d_model, seq_level=seq_level, seed=args.seed
        )
        args.index_csv = str(csv_path)
        args.audio_dir = str(audio_dir)
        args.text_dir = str(text_dir)
    return args
