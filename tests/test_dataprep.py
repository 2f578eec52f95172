"""L0/L1 data-prep layer: index builders, extraction, integrity, baselines.

Runs the full corpus→index→features→training-ready chain on synthetic
raw corpora (fake IEMOCAP directory tree, fake MOSEI .csd files) with
tiny random-init frontends.
"""

import numpy as np
import pandas as pd
import pytest
from pathlib import Path

from hriemo.dataprep import iemocap_index as II
from hriemo.dataprep.mosei_csd import CsdFile, slice_by_interval, write_csd


# ------------------------------------------------------------ fake corpora

def make_fake_iemocap(root: Path, sessions=(1, 4, 5), utts_per_session=3):
    from scipy.io import wavfile

    labels = ["ang", "hap", "sad", "neu", "fru", "exc", "oth"]  # oth filtered
    rng = np.random.default_rng(0)
    for s in sessions:
        sess = root / f"Session{s}"
        dialog = f"Ses0{s}F_impro01"
        emo_dir = sess / "dialog" / "EmoEvaluation"
        emo_dir.mkdir(parents=True)
        tr_dir = sess / "dialog" / "transcriptions"
        tr_dir.mkdir(parents=True)
        wav_dir = sess / "sentences" / "wav" / dialog
        wav_dir.mkdir(parents=True)
        fa_dir = sess / "sentences" / "ForcedAlignment" / dialog
        fa_dir.mkdir(parents=True)

        emo_lines = ["% header junk"]
        tr_lines = []
        for i in range(utts_per_session):
            uid = f"{dialog}_F{i:03d}"
            lab = labels[(s + i) % len(labels)]
            emo_lines.append(f"[{i*2:.4f} - {i*2+1.5:.4f}]\t{uid}\t{lab}\t[2.5, 2.5, 2.5]")
            wav = (rng.standard_normal(8000) * 0.1).astype(np.float32)
            wavfile.write(wav_dir / f"{uid}.wav", 16000, (wav * 32767).astype(np.int16))
            if i == 0:
                # no transcript line -> forces .wdseg fallback
                (fa_dir / f"{uid}.wdseg").write_text(
                    "SFrm EFrm Word\n0 10 <s>\n10 50 HELLO(2)\n50 80 WORLD\n80 90 </s>\n")
            else:
                tr_lines.append(f"{uid} [{i*2:.4f}-{i*2+1.5:.4f}]: Hi there <NOISE> friend (2)")
        (emo_dir / f"{dialog}.txt").write_text("\n".join(emo_lines))
        (tr_dir / f"{dialog}.txt").write_text("\n".join(tr_lines))
    return root


# ------------------------------------------------------------------ tests

@pytest.fixture(scope="module")
def iemocap_root(tmp_path_factory):
    return make_fake_iemocap(tmp_path_factory.mktemp("iemocap"))


def test_iemocap_index_builder(iemocap_root, tmp_path):
    out = II.main(["--base", str(iemocap_root), "--out_dir", str(tmp_path)])
    df = pd.read_csv(out)
    # 3 utts per session x 3 sessions, 'oth' label rows filtered out
    assert set(df.columns) >= {"utter_id", "session", "audio_path", "text", "label", "split"}
    assert set(df["label"]) <= set(II.KEEP_6.values())
    # split rule: Session5->test, Session4->val, rest->train
    assert (df[df.session == "Session5"]["split"] == "test").all()
    assert (df[df.session == "Session4"]["split"] == "val").all()
    assert (df[df.session == "Session1"]["split"] == "train").all()
    # wdseg fallback used for F000 rows (transcript missing)
    f000 = df[df.utter_id.str.endswith("F000")]
    assert (f000["text"] == "hello world").all()
    # transcript rows cleaned of tags and (N) markers
    others = df[~df.utter_id.str.endswith("F000")]
    assert (others["text"] == "Hi there friend").all()


def test_iemocap_extraction_chain(iemocap_root, tmp_path):
    from hriemo.dataprep.extract_iemocap import main as extract
    from hriemo.data import SeqLevelDataset
    from hriemo.dataprep.integrity import analyze_lengths, check_integrity

    idx = II.main(["--base", str(iemocap_root), "--out_dir", str(tmp_path)])
    audio_dir = tmp_path / "feats" / "audio"
    text_dir = tmp_path / "feats" / "text"
    extract(["--modality", "audio", "--level", "seq", "--index_csv", str(idx),
             "--out_dir", str(audio_dir), "--tiny", "--random_init",
             "--batch_size", "4", "--max_seconds", "1.0"])
    extract(["--modality", "text", "--level", "seq", "--index_csv", str(idx),
             "--out_dir", str(text_dir), "--tiny", "--random_init",
             "--batch_size", "4", "--max_len_text", "16"])

    report = check_integrity(str(idx), str(audio_dir), str(text_dir))
    assert report["ok"], report
    stats = analyze_lengths(str(audio_dir), str(tmp_path / "length_stats.csv"))
    assert stats["count"] > 0 and stats["p95"] > 0

    # extracted features feed the training dataset directly
    df = pd.read_csv(idx)
    ds = SeqLevelDataset(df, audio_dir, text_dir, label_col="label",
                         label2id={l: i for i, l in enumerate(sorted(set(df.label)))})
    item = ds[0]
    assert item["h_a"].ndim == 2 and item["h_t"].ndim == 2
    assert item["h_a"].shape[1] == 32  # tiny wavlm hidden


def test_iemocap_utter_extraction(iemocap_root, tmp_path):
    from hriemo.dataprep.extract_iemocap import main as extract
    from hriemo.data import load_utter_feature

    idx = II.main(["--base", str(iemocap_root), "--out_dir", str(tmp_path)])
    out = extract(["--modality", "audio", "--level", "utter", "--index_csv", str(idx),
                   "--out_dir", str(tmp_path / "ua"), "--tiny", "--random_init",
                   "--batch_size", "4", "--max_seconds", "1.0"])
    df = pd.read_csv(idx)
    vec = load_utter_feature(out / f"{df.iloc[0].utter_id}.npz")
    assert vec.shape == (32,)


# ------------------------------------------------------------------- MOSEI

@pytest.fixture(scope="module")
def mosei_csds(tmp_path_factory):
    root = tmp_path_factory.mktemp("mosei")
    rng = np.random.default_rng(1)
    labels, covarep, words = {}, {}, {}
    for v in range(4):
        vid = f"video{v}"
        n_seg = 3
        seg_iv = np.asarray([[i * 5.0, i * 5.0 + 4.0] for i in range(n_seg)])
        lab = rng.uniform(-1, 3, size=(n_seg, 7))
        labels[vid] = (lab, seg_iv)
        # covarep: 10Hz frames over 15s, some NaNs like real COVAREP
        n_frames = 150
        iv = np.stack([np.arange(n_frames) * 0.1, np.arange(n_frames) * 0.1 + 0.1], 1)
        feats = rng.standard_normal((n_frames, 74))
        feats[::17] = np.nan
        covarep[vid] = (feats, iv)
        # word vectors: 1 word/sec
        n_words = 15
        wiv = np.stack([np.arange(n_words) * 1.0, np.arange(n_words) + 1.0], 1)
        words[vid] = (rng.standard_normal((n_words, 300)), wiv)
    write_csd(root / "labels.csd", "CMU_MOSEI_Labels", labels)
    write_csd(root / "covarep.csd", "CMU_MOSEI_COVAREP", covarep)
    write_csd(root / "words.csd", "CMU_MOSEI_WordVectors", words)
    return root


def test_csd_roundtrip(mosei_csds):
    csd = CsdFile(mosei_csds / "labels.csd")
    assert len(csd.keys()) == 4
    assert csd.features("video0").shape == (3, 7)
    assert csd.intervals("video0").shape == (3, 2)
    csd.close()


def test_slice_by_interval_center_and_fallback():
    feats = np.arange(10, dtype=np.float32)[:, None]
    iv = np.stack([np.arange(10.0), np.arange(10.0) + 1.0], 1)
    seg = slice_by_interval(feats, iv, 2.0, 5.0)  # centers 2.5, 3.5, 4.5
    np.testing.assert_array_equal(seg[:, 0], [2, 3, 4])
    # no center inside -> overlap fallback
    seg = slice_by_interval(feats, iv, 3.6, 3.9)
    np.testing.assert_array_equal(seg[:, 0], [3])


def test_mosei_index_and_extraction(mosei_csds, tmp_path):
    from hriemo.dataprep.mosei_index import main as build_index
    from hriemo.dataprep.extract_mosei import main as extract
    import json

    folds = {"train": ["video0", "video1"], "valid": ["video2"], "test": ["video3"]}
    folds_path = tmp_path / "folds.json"
    folds_path.write_text(json.dumps(folds))

    idx = build_index(["--labels_csd", str(mosei_csds / "labels.csd"),
                       "--folds_json", str(folds_path), "--out_dir", str(tmp_path)])
    df = pd.read_csv(idx)
    assert len(df) == 12  # 4 videos x 3 segments
    assert set(df["split"]) == {"train", "val", "test"}
    assert (df[df.video_id == "video2"]["split"] == "val").all()
    assert {"emo_happy", "emo_surprise", "sentiment"} <= set(df.columns)

    audio_dir = extract(["--modality", "audio", "--feats_csd", str(mosei_csds / "covarep.csd"),
                         "--index_csv", str(idx), "--out_dir", str(tmp_path / "audio")])
    text_dir = extract(["--modality", "text", "--feats_csd", str(mosei_csds / "words.csd"),
                        "--index_csv", str(idx), "--out_dir", str(tmp_path / "text")])

    from hriemo.data import load_feature, read_meta
    h, m = load_feature(audio_dir / "video0_1.npz")
    assert h.shape[1] == 74 and np.isfinite(h).all()  # NaNs cleaned
    assert h.shape[0] == 40  # 4s segment at 10Hz
    h, _ = load_feature(text_dir / "video0_1.npz")
    assert h.shape[1] == 300
    assert read_meta(audio_dir)["hidden_dim"] == 74


def test_mosei_index_requires_official_folds(mosei_csds, tmp_path):
    """No folds source and no opt-in flag -> hard failure (VERDICT r1 #5)."""
    from hriemo.dataprep.mosei_index import main as build_index

    with pytest.raises(SystemExit, match="standard folds"):
        build_index(["--labels_csd", str(mosei_csds / "labels.csd"),
                     "--out_dir", str(tmp_path)])


def test_mosei_index_hash_fallback_is_opt_in(mosei_csds, tmp_path):
    from hriemo.dataprep.mosei_index import main as build_index

    args = ["--labels_csd", str(mosei_csds / "labels.csd"),
            "--out_dir", str(tmp_path), "--allow_nonstandard_split"]
    idx = build_index(args)
    df = pd.read_csv(idx)
    assert len(df) == 12
    # hash split is deterministic
    idx2 = build_index(args)
    pd.testing.assert_frame_equal(df, pd.read_csv(idx2))


def test_standard_folds_resolution_chain(tmp_path, monkeypatch):
    import json

    from hriemo.dataprep import standard_folds as sf

    # 1. SDK-checkout parsing: a synthetic cmu_mosei_std_folds.py
    sdk = tmp_path / "sdk" / "mmsdk" / "CMU_MOSEI"
    sdk.mkdir(parents=True)
    (sdk / "cmu_mosei_std_folds.py").write_text(
        "standard_train_fold=['a','b']\n"
        "standard_valid_fold=['c']\n"
        "standard_test_fold=['d','e']\n")
    folds = sf.folds_from_sdk_checkout(tmp_path / "sdk")
    assert folds == {"train": ["a", "b"], "valid": ["c"], "test": ["d", "e"]}

    # 2. exporter tool writes the packaged file; loader picks it up
    packaged = tmp_path / "packaged.json"
    from tools.export_mosei_standard_folds import main as export_main

    export_main(["--sdk", str(tmp_path / "sdk"), "--out", str(packaged)])
    monkeypatch.setattr(sf, "PACKAGED_FOLDS", packaged)
    assert sf.load_standard_folds() == folds

    # 3. explicit JSON wins over the packaged file; 'val' alias accepted
    other = tmp_path / "other.json"
    other.write_text(json.dumps({"train": ["x"], "val": ["y"], "test": ["z"]}))
    assert sf.load_standard_folds(other)["valid"] == ["y"]

    # 4. nothing available -> FoldsUnavailable
    monkeypatch.setattr(sf, "PACKAGED_FOLDS", tmp_path / "missing.json")
    with pytest.raises(sf.FoldsUnavailable):
        sf.load_standard_folds()


# --------------------------------------------------------------- baselines

def test_linear_probe_baseline(tmp_path):
    from hriemo.train.linear_probe_baseline import main

    res = main(["--synthetic", "64", "--d_model", "32", "--epochs", "60",
                "--batch_size", "16", "--out_dir", str(tmp_path / "probe")])
    assert res["val"]["acc"] > 1.0 / 6  # beats chance on separable synthetic
    assert (tmp_path / "probe" / "metrics.json").exists()


def test_text_baseline(tmp_path):
    from hriemo.train.train_text_baseline import main

    res = main(["--synthetic", "64", "--d_model", "32", "--epochs", "40",
                "--batch_size", "16", "--head", "mlp", "--hidden", "32",
                "--out_dir", str(tmp_path / "textbl")])
    assert res["val"]["macro_f1"] > 0.1
    assert (tmp_path / "textbl" / "metrics.json").exists()
