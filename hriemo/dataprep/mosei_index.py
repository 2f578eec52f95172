#!/usr/bin/env python3
"""MOSEI index builder
(reference: scripts/mosei_feature_extraction_seq_level/build_mosei_index_splits.py).

Behavioral contract:
  * labels come from ``CMU_MOSEI_Labels.csd``: each segment's label row is
    ``[sentiment, happy, sad, anger, fear, disgust, surprise]``
    (reference :40-55);
  * uid = ``{video_id}_{segment_idx}`` (reference :53);
  * emotion columns keep the **raw scale** (values may be negative);
  * splits use the official standard folds. mmsdk is unavailable here, so
    folds are read from a JSON file ``{"train": [vid…], "valid": […],
    "test": […]}`` (--folds_json, e.g. exported once from
    mmsdk.cmu_mosei.standard_folds); without it a deterministic
    hash-by-video fallback split is used with a warning.
"""

from __future__ import annotations

import argparse
import hashlib
import json
from pathlib import Path

import numpy as np

from .mosei_csd import CsdFile

EMO_COLS = ["emo_happy", "emo_sad", "emo_anger", "emo_fear", "emo_disgust", "emo_surprise"]


def _hash_split(video_id: str) -> str:
    h = int(hashlib.sha1(video_id.encode()).hexdigest(), 16) % 100
    return "train" if h < 70 else ("val" if h < 85 else "test")


def build_rows(labels_csd: str | Path, folds: dict | None) -> list[dict]:
    csd = CsdFile(labels_csd)
    fold_of = {}
    if folds:
        for name, key in (("train", "train"), ("val", "valid"), ("test", "test")):
            for vid in folds.get(key, folds.get(name, [])):
                fold_of[vid] = name

    rows = []
    for vid in csd.keys():
        feats = csd.features(vid)       # [n_segments, 7]
        intervals = csd.intervals(vid)  # [n_segments, 2]
        for i in range(feats.shape[0]):
            row = feats[i]
            uid = f"{vid}_{i}"
            split = fold_of.get(vid) if folds else _hash_split(vid)
            if split is None:
                continue  # video not in official folds
            entry = {
                "uid": uid, "video_id": vid, "seg_idx": i,
                "t_start": float(intervals[i, 0]), "t_end": float(intervals[i, 1]),
                "sentiment": float(row[0]), "split": split,
            }
            for c, name in enumerate(EMO_COLS):
                entry[name] = float(np.nan_to_num(row[1 + c]))
            rows.append(entry)
    csd.close()
    return rows


def main(argv=None):
    import pandas as pd

    ap = argparse.ArgumentParser()
    ap.add_argument("--labels_csd", type=str, required=True)
    ap.add_argument("--folds_json", type=str, default=None)
    ap.add_argument("--out_dir", type=str, default="data")
    args = ap.parse_args(argv)

    folds = None
    if args.folds_json:
        with open(args.folds_json) as f:
            folds = json.load(f)
    else:
        print("[index] WARNING: no --folds_json; using deterministic hash split "
              "(NOT the official standard folds)")

    rows = build_rows(args.labels_csd, folds)
    df = pd.DataFrame(rows)
    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    out_csv = out_dir / "mosei_index_splits.csv"
    df.to_csv(out_csv, index=False)
    print(f"[index] {len(df)} segments from {df['video_id'].nunique()} videos")
    print(df["split"].value_counts().to_string())
    # sanity: raw label scale (reference prints this too, :77-82)
    for c in EMO_COLS:
        print(f"  {c}: min={df[c].min():.2f} max={df[c].max():.2f}")
    return out_csv


if __name__ == "__main__":
    main()
