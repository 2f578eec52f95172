#!/usr/bin/env python3
"""MOSEI index builder
(reference: scripts/mosei_feature_extraction_seq_level/build_mosei_index_splits.py).

Behavioral contract:
  * labels come from ``CMU_MOSEI_Labels.csd``: each segment's label row is
    ``[sentiment, happy, sad, anger, fear, disgust, surprise]``
    (reference :40-55);
  * uid = ``{video_id}_{segment_idx}`` (reference :53);
  * emotion columns keep the **raw scale** (values may be negative);
  * splits use the **official standard folds**, resolved via
    :mod:`hriemo.dataprep.standard_folds` (explicit --folds_json >
    packaged data file > mmsdk > SDK checkout). If no source is available
    the builder FAILS unless ``--allow_nonstandard_split`` is passed, in
    which case a deterministic hash-by-video split is used and every
    emitted artifact is loudly labeled non-standard.
"""

from __future__ import annotations

import argparse
import hashlib
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

    from .standard_folds import FoldsUnavailable, load_standard_folds

    ap = argparse.ArgumentParser()
    ap.add_argument("--labels_csd", type=str, required=True)
    ap.add_argument("--folds_json", type=str, default=None,
                    help="explicit folds JSON; default: packaged standard folds")
    ap.add_argument("--sdk_path", type=str, default=None,
                    help="CMU-MultimodalSDK checkout to parse folds from")
    ap.add_argument("--allow_nonstandard_split", action="store_true",
                    help="opt-in: deterministic hash-by-video split when the "
                         "official folds are unavailable (NOT comparable to "
                         "published MOSEI numbers)")
    ap.add_argument("--out_dir", type=str, default="data")
    args = ap.parse_args(argv)

    try:
        folds = load_standard_folds(args.folds_json, sdk_path=args.sdk_path)
        print(f"[index] official standard folds: "
              f"{ {k: len(v) for k, v in folds.items()} }")
    except FoldsUnavailable as e:
        if not args.allow_nonstandard_split:
            raise SystemExit(f"[index] ERROR: {e}")
        folds = None
        print("[index] WARNING: using NON-STANDARD deterministic hash split "
              "(--allow_nonstandard_split). Split membership differs from the "
              "official CMU-MOSEI folds; numbers are not comparable.")

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
