"""Index-CSV datasets (host side).

Reproduces the reference dataset semantics (SURVEY.md §2.3):
  * rows missing either modality's feature file are filtered with a count
    message (reference: train_mosei_...py:219-231);
  * uid column is ``utter_id`` or ``uid`` (reference: mosei_eval_infer.py:80-85);
  * ``label2id`` is built from sorted unique labels
    (reference: train_fusion_utter_level.py:221-229);
  * sequences longer than ``max_len`` are center-cropped, and — quirk
    preserved — the crop **resets the pad mask to all-valid**
    (reference: train_mosei_...py:278-283);
  * NaN labels are cleaned to 0 (reference :289).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from .feature_store import load_feature, load_utter_feature


def crop_center(x: np.ndarray, max_len: int) -> np.ndarray:
    """Center-crop along axis 0 (reference: train_mosei_...py:178-183)."""
    if x.shape[0] <= max_len:
        return x
    start = (x.shape[0] - max_len) // 2
    return x[start : start + max_len]


def build_label2id(labels) -> dict:
    return {lab: i for i, lab in enumerate(sorted(set(map(str, labels))))}


def resolve_uid_col(df, uid_col: str | None = None) -> str:
    if uid_col and uid_col in df.columns:
        return uid_col
    for cand in ("utter_id", "uid"):
        if cand in df.columns:
            return cand
    raise KeyError(f"No uid column in index CSV: {list(df.columns)}")


def _find_feat(feat_dir: Path, uid: str) -> Path | None:
    for ext in (".npz", ".pt", ".pth", ".npy"):
        p = feat_dir / f"{uid}{ext}"
        if p.is_file():
            return p
    return None


class SeqLevelDataset:
    """Sequence-level two-modality dataset over an index dataframe.

    ``__getitem__`` returns a dict of numpy arrays:
        h_a [L_a, d_a], mask_a [L_a] bool (True=PAD),
        h_t [L_t, d_t], mask_t [L_t] bool, y (labels, dataset-specific).
    """

    def __init__(
        self,
        df,
        audio_dir: str | Path,
        text_dir: str | Path,
        uid_col: str | None = None,
        emo_cols: list[str] | None = None,
        label_col: str | None = None,
        label2id: dict | None = None,
        max_len_audio: int = 0,
        max_len_text: int = 0,
        verbose: bool = True,
    ):
        self.audio_dir = Path(audio_dir)
        self.text_dir = Path(text_dir)
        self.uid_col = resolve_uid_col(df, uid_col)
        self.emo_cols = emo_cols
        self.label_col = label_col
        self.label2id = label2id
        self.max_len_audio = max_len_audio
        self.max_len_text = max_len_text

        df = df.reset_index(drop=True)
        keep, missing = [], 0
        self._paths = []
        for i, row in df.iterrows():
            uid = str(row[self.uid_col])
            pa = _find_feat(self.audio_dir, uid)
            pt = _find_feat(self.text_dir, uid)
            if pa is not None and pt is not None:
                keep.append(i)
                self._paths.append((pa, pt))
            else:
                missing += 1
        if missing > 0 and verbose:
            print(f"[Dataset] Filtered out {missing} rows without both modalities.")
        self.df = df.iloc[keep].reset_index(drop=True)
        if verbose:
            print(f"[Dataset] Final size: {len(self.df)} samples")

    def __len__(self):
        return len(self.df)

    def _labels(self, row):
        if self.emo_cols is not None:
            y = np.asarray([float(row[c]) for c in self.emo_cols], dtype=np.float32)
            return np.nan_to_num(y, nan=0.0)
        if self.label_col is not None:
            lab = str(row[self.label_col])
            return np.int64(self.label2id[lab]) if self.label2id else lab
        return None

    def __getitem__(self, idx: int) -> dict:
        row = self.df.iloc[idx]
        pa, pt = self._paths[idx]
        h_a, m_a = load_feature(pa)
        h_t, m_t = load_feature(pt)
        mask_a = m_a == 0  # True = PAD
        mask_t = m_t == 0

        if self.max_len_audio > 0:
            h_a = crop_center(h_a, self.max_len_audio)
            mask_a = np.zeros(h_a.shape[0], dtype=bool)  # quirk: mask reset
        if self.max_len_text > 0:
            h_t = crop_center(h_t, self.max_len_text)
            mask_t = np.zeros(h_t.shape[0], dtype=bool)

        out = {"h_a": h_a, "mask_a": mask_a, "h_t": h_t, "mask_t": mask_t}
        y = self._labels(row)
        if y is not None:
            out["y"] = y
        out["uid"] = str(row[self.uid_col])
        return out


class UtterLevelDataset:
    """Utterance-level dataset: one ``[d]`` vector per modality per uid
    (reference: train_fusion_utter_level.py:164-198)."""

    def __init__(
        self,
        df,
        audio_dir: str | Path,
        text_dir: str | Path,
        uid_col: str | None = None,
        label_col: str = "label",
        label2id: dict | None = None,
        verbose: bool = True,
    ):
        self.audio_dir = Path(audio_dir)
        self.text_dir = Path(text_dir)
        self.uid_col = resolve_uid_col(df, uid_col)
        self.label_col = label_col

        df = df.reset_index(drop=True)
        keep, missing = [], 0
        self._paths = []
        for i, row in df.iterrows():
            uid = str(row[self.uid_col])
            pa = _find_feat(self.audio_dir, uid)
            pt = _find_feat(self.text_dir, uid)
            if pa is not None and pt is not None:
                keep.append(i)
                self._paths.append((pa, pt))
            else:
                missing += 1
        if missing > 0 and verbose:
            print(f"[Dataset] Filtered out {missing} rows without both modalities.")
        self.df = df.iloc[keep].reset_index(drop=True)
        self.label2id = label2id or build_label2id(self.df[label_col])

    def __len__(self):
        return len(self.df)

    def __getitem__(self, idx: int) -> dict:
        row = self.df.iloc[idx]
        pa, pt = self._paths[idx]
        return {
            "h_a": load_utter_feature(pa),
            "h_t": load_utter_feature(pt),
            "y": np.int64(self.label2id[str(row[self.label_col])]),
            "uid": str(row[self.uid_col]),
        }
