"""Synthetic corpus generator — tiny fake feature stores + index CSVs.

Lets every pipeline (train/infer/tools) run end-to-end with no real
IEMOCAP/MOSEI data (the reference has no such fixture; SURVEY.md §4 calls
this out as a gap to fill). Labels are generated with a planted linear
signal so smoke-training can actually reduce loss.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from .feature_store import save_feature, write_meta

MOSEI_EMO_COLS = ["emo_happy", "emo_sad", "emo_anger", "emo_fear", "emo_disgust", "emo_surprise"]
IEMOCAP_LABELS = ["angry", "excited", "frustrated", "happy", "neutral", "sad"]


def make_synthetic_mosei(
    root: str | Path,
    n: int = 32,
    d_audio: int = 74,
    d_text: int = 300,
    max_la: int = 40,
    max_lt: int = 16,
    seed: int = 0,
    fmt: str = "npz",
):
    """Create features/{audio,text}/{uid}.<fmt> + index CSV. Returns (csv_path, audio_dir, text_dir)."""
    import pandas as pd

    root = Path(root)
    audio_dir = root / "features" / "audio"
    text_dir = root / "features" / "text"
    rng = np.random.default_rng(seed)

    w = rng.standard_normal((d_audio + d_text, len(MOSEI_EMO_COLS))) * 0.5
    rows = []
    for i in range(n):
        uid = f"vid{i // 4}_{i % 4}"
        la = int(rng.integers(max_la // 2, max_la + 1))
        lt = int(rng.integers(max_lt // 2, max_lt + 1))
        h_a = rng.standard_normal((la, d_audio)).astype(np.float32)
        h_t = rng.standard_normal((lt, d_text)).astype(np.float32)
        save_feature(audio_dir / f"{uid}.{fmt}", h_a, np.ones(la, np.int64))
        save_feature(text_dir / f"{uid}.{fmt}", h_t, np.ones(lt, np.int64))
        pooled = np.concatenate([h_a.mean(0), h_t.mean(0)])
        y = np.clip(pooled @ w + rng.standard_normal(len(MOSEI_EMO_COLS)) * 0.1, -1, 3)
        split = "train" if i < int(0.7 * n) else ("val" if i < int(0.85 * n) else "test")
        row = {"uid": uid, "video_id": uid.split("_")[0], "split": split}
        row.update({c: float(v) for c, v in zip(MOSEI_EMO_COLS, y)})
        rows.append(row)

    write_meta(audio_dir, hidden_dim=d_audio, model="synthetic-covarep", level="seq")
    write_meta(text_dir, hidden_dim=d_text, model="synthetic-glove", level="seq")
    csv_path = root / "mosei_index_splits.csv"
    pd.DataFrame(rows).to_csv(csv_path, index=False)
    return csv_path, audio_dir, text_dir


def make_seq_temp_fixture(root: str | Path = ".", seed: int = 0) -> Path:
    """Write the exact feature file the reference's ``tests/test_seq_temp.py``
    loads (``features/seq_level/text/Ses01F_impro01_F005.pt``), so that
    data-dependent smoke script runs unchanged without real IEMOCAP data.

    Layout = the seq-level artifact contract (SURVEY.md §1): ``hidden``
    FloatTensor[L, 768] + ``attention_mask`` LongTensor[L] with 1=valid.
    """
    import torch

    path = Path(root) / "features" / "seq_level" / "text" / "Ses01F_impro01_F005.pt"
    if path.exists():
        return path
    rng = np.random.default_rng(seed)
    l, valid = 128, 97
    hidden = rng.standard_normal((l, 768)).astype(np.float32)
    mask = np.zeros(l, np.int64)
    mask[:valid] = 1
    hidden[valid:] = 0.0
    path.parent.mkdir(parents=True, exist_ok=True)
    torch.save({"hidden": torch.from_numpy(hidden),
                "attention_mask": torch.from_numpy(mask)}, path)
    return path


def make_synthetic_iemocap(
    root: str | Path,
    n: int = 32,
    d: int = 768,
    seq_level: bool = False,
    max_la: int = 40,
    max_lt: int = 16,
    seed: int = 0,
    fmt: str = "npz",
):
    """IEMOCAP-style corpus: single label column, utter- or seq-level feats."""
    import pandas as pd

    root = Path(root)
    audio_dir = root / "features" / "audio"
    text_dir = root / "features" / "text"
    rng = np.random.default_rng(seed)

    centroids = rng.standard_normal((len(IEMOCAP_LABELS), d)) * 2.0
    rows = []
    for i in range(n):
        uid = f"Ses0{i % 5 + 1}F_impro0{i % 8 + 1}_F{i:03d}"
        cls = int(rng.integers(len(IEMOCAP_LABELS)))
        if seq_level:
            la = int(rng.integers(max_la // 2, max_la + 1))
            lt = int(rng.integers(max_lt // 2, max_lt + 1))
            h_a = (centroids[cls] + rng.standard_normal((la, d))).astype(np.float32)
            h_t = (centroids[cls] + rng.standard_normal((lt, d))).astype(np.float32)
            save_feature(audio_dir / f"{uid}.{fmt}", h_a, np.ones(la, np.int64))
            save_feature(text_dir / f"{uid}.{fmt}", h_t, np.ones(lt, np.int64))
        else:
            h_a = (centroids[cls] + rng.standard_normal(d)).astype(np.float32)
            h_t = (centroids[cls] + rng.standard_normal(d)).astype(np.float32)
            if fmt == "pt":
                # reference utter-level layout: a bare [d] tensor
                import torch

                audio_dir.mkdir(parents=True, exist_ok=True)
                text_dir.mkdir(parents=True, exist_ok=True)
                torch.save(torch.tensor(h_a), audio_dir / f"{uid}.pt")
                torch.save(torch.tensor(h_t), text_dir / f"{uid}.pt")
            else:
                save_feature(audio_dir / f"{uid}.{fmt}", h_a)
                save_feature(text_dir / f"{uid}.{fmt}", h_t)
        split = "train" if i < int(0.7 * n) else ("val" if i < int(0.85 * n) else "test")
        rows.append({"utter_id": uid, "label": IEMOCAP_LABELS[cls], "split": split})

    write_meta(audio_dir, hidden_dim=d, model="synthetic-wavlm",
               level="seq" if seq_level else "utter")
    write_meta(text_dir, hidden_dim=d, model="synthetic-bert",
               level="seq" if seq_level else "utter")
    csv_path = root / "iemocap_index_splits.csv"
    pd.DataFrame(rows).to_csv(csv_path, index=False)
    return csv_path, audio_dir, text_dir
