#!/usr/bin/env python3
"""IEMOCAP corpus indexing + session splits
(reference: scripts/iemocap_feature_extraction_seq_level/build_iemocap_index_splits.py).

Behavioral contract:
  * EmoEvaluation headers ``[start - end] utter_id LAB [v, a, d]`` parsed
    by regex (reference HEAD_RE :19-21);
  * keep 6 classes {ang, hap, sad, neu, fru, exc} mapped to long names
    (reference :24-25);
  * audio from ``sentences/**/*.wav``; text preferred from dialog
    transcripts (line keyed by utter id, tags/noise markers cleaned),
    ``.wdseg`` forced-alignment word list as fallback (reference :174-182);
  * split rule: Session5 → test, Session4 → val, rest → train
    (reference :209-216);
  * emits ``iemocap_index.csv`` and ``iemocap_index_splits.csv``.
"""

from __future__ import annotations

import argparse
import re
from pathlib import Path

HEAD_RE = re.compile(
    r"^\[(\d+\.\d+)\s*-\s*(\d+\.\d+)\]\s+(\S+)\s+([A-Za-z]{3})\s*\[\s*([\d\.\s,]+)\s*\]\s*$"
)
KEEP_6 = {"ang": "angry", "hap": "happy", "sad": "sad",
          "neu": "neutral", "fru": "frustration", "exc": "excited"}
UID_RE = re.compile(r"(Ses\d{2}[MF]_[A-Za-z]+\d+_[MF]\d{3,4})")
DIALOG_RE = re.compile(r"^(Ses\d{2}[MF]_[A-Za-z]+\d+)_")
NOISE_WORDS = {"sil", "sp", "garbage", "<sil>", "</s>", "<s>"}


def read_text_robust(path: Path) -> str:
    for enc in ("utf-8", "utf-8-sig", "cp1252", "latin-1"):
        try:
            return path.read_text(encoding=enc)
        except UnicodeDecodeError:
            continue
    return path.read_text(encoding="utf-8", errors="ignore")


def uid_from_stem(stem: str) -> str | None:
    m = UID_RE.search(stem)
    return m.group(1) if m else None


def dialog_id(uid: str) -> str | None:
    m = DIALOG_RE.match(uid)
    return m.group(1) if m else None


def clean_transcript_line(line: str) -> str:
    """Strip the uid/timestamp prefix and noise/markup tags."""
    line = re.sub(r"^Ses\d{2}[MF]_[A-Za-z]+\d+_[MF]\d{3,4}\s*\[.*?\]\s*:\s*", "", line)
    line = re.sub(r"</?s>", " ", line, flags=re.I)
    line = re.sub(r"<\s*(sil|sp|noise|laughter)\s*>", " ", line, flags=re.I)
    line = re.sub(r"\(\d+\)", " ", line)
    line = re.sub(r"<[^>]+>", " ", line)
    return re.sub(r"\s+", " ", line).strip()


def text_from_transcript(path: Path, uid: str) -> str | None:
    pat = re.compile(rf"^{re.escape(uid)}\b")
    try:
        for raw in read_text_robust(path).splitlines():
            if pat.search(raw):
                return clean_transcript_line(raw)
    except FileNotFoundError:
        return None
    return None


def wdseg_to_text(path: Path) -> str:
    """Forced-alignment word list → plain text (fallback)."""
    words = []
    try:
        for line in read_text_robust(path).splitlines():
            parts = line.strip().split()
            if len(parts) >= 3:
                # skip header/footer lines ("SFrm EFrm SegAScr Word", totals)
                if not parts[0].lstrip("-").isdigit():
                    continue
                w = parts[-1].lower()
                if w in NOISE_WORDS:
                    continue
                w = re.sub(r"[{}<>]", "", w)
                # strip sphinx alternate-pronunciation suffixes like word(2)
                w = re.sub(r"\(\d+\)$", "", w)
                if w:
                    words.append(w)
    except FileNotFoundError:
        return ""
    return " ".join(words)


def parse_emotion_labels(base: Path) -> list[dict]:
    rows = []
    for sess_dir in sorted(base.glob("Session*")):
        emo_dir = sess_dir / "dialog" / "EmoEvaluation"
        if not emo_dir.is_dir():
            continue
        for emo_file in sorted(emo_dir.glob("*.txt")):
            for line in read_text_robust(emo_file).splitlines():
                m = HEAD_RE.match(line.strip())
                if not m:
                    continue
                start, end, uid, lab, vad = m.groups()
                lab = lab.lower()
                if lab in KEEP_6:
                    rows.append({
                        "session": sess_dir.name, "utter_id": uid,
                        "label": KEEP_6[lab],
                        "t_start": float(start), "t_end": float(end), "vad": vad,
                    })
    return rows


def build_index(base: Path) -> "pd.DataFrame":
    import pandas as pd

    labels = pd.DataFrame(parse_emotion_labels(base))
    if labels.empty:
        raise SystemExit(f"No EmoEvaluation labels found under {base}")

    rows = []
    for sess_dir in sorted(base.glob("Session*")):
        wav_map = {uid_from_stem(p.stem): p
                   for p in (sess_dir / "sentences").rglob("*.wav")
                   if uid_from_stem(p.stem)}
        wdseg_map = {uid_from_stem(p.stem): p
                     for p in (sess_dir / "sentences" / "ForcedAlignment").rglob("*.wdseg")
                     if uid_from_stem(p.stem)}
        txt_map = {p.stem: p
                   for p in (sess_dir / "dialog" / "transcriptions").rglob("*.txt")}
        for uid in sorted(set(wav_map) | set(wdseg_map)):
            did = dialog_id(uid)
            rows.append({
                "session": sess_dir.name, "utter_id": uid,
                "audio_path": wav_map.get(uid),
                "wdseg_path": wdseg_map.get(uid),
                "transcript_path": txt_map.get(did) if did else None,
            })
    index = pd.DataFrame(rows)
    merged = index.merge(labels[["session", "utter_id", "label"]],
                         on=["session", "utter_id"], how="inner")

    def pick_text(row):
        # transcript preferred; forced-alignment fallback (reference :174-182)
        if row["transcript_path"] is not None:
            txt = text_from_transcript(row["transcript_path"], row["utter_id"])
            if txt:
                return txt
        if row["wdseg_path"] is not None:
            return wdseg_to_text(row["wdseg_path"]) or None
        return None

    merged["text"] = merged.apply(pick_text, axis=1)
    final = merged[merged["audio_path"].notna() & merged["text"].notna()].copy()
    final = final.sort_values(["session", "utter_id"]).reset_index(drop=True)
    for col in ("audio_path", "wdseg_path", "transcript_path"):
        final[col] = final[col].map(lambda p: str(Path(p).resolve()) if p is not None else None)
    return final


def assign_splits(df):
    split_map = {"Session5": "test", "Session4": "val"}
    df = df.copy()
    df["split"] = df["session"].map(split_map).fillna("train")
    return df


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", type=str, required=True,
                    help="IEMOCAP_full_release directory")
    ap.add_argument("--out_dir", type=str, default="data")
    args = ap.parse_args(argv)

    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    df = build_index(Path(args.base))
    df[["utter_id", "session", "audio_path", "text", "label"]].to_csv(
        out_dir / "iemocap_index.csv", index=False)
    df = assign_splits(df)
    df.to_csv(out_dir / "iemocap_index_splits.csv", index=False)
    print(f"[index] {len(df)} aligned samples")
    print(df["split"].value_counts().to_string())
    print(df.groupby(["split", "label"]).size().reset_index(name="count").to_string(index=False))
    return out_dir / "iemocap_index_splits.csv"


if __name__ == "__main__":
    main()
