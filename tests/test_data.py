"""Data layer: feature store round-trips, dataset semantics, static batching."""

import numpy as np
import pandas as pd
import pytest

from hriemo.data import (
    BucketBatcher,
    SeqLevelDataset,
    UtterLevelDataset,
    build_label2id,
    crop_center,
    load_feature,
    load_utter_feature,
    pad_batch,
    prefetch_to_device,
    read_meta,
    save_feature,
)
from hriemo.data.feature_store import hidden_dim_from_meta
from hriemo.data.synthetic import make_synthetic_iemocap, make_synthetic_mosei


def test_feature_roundtrip_npz_and_pt(tmp_path):
    h = np.random.default_rng(0).standard_normal((7, 5)).astype(np.float32)
    m = np.array([1, 1, 1, 1, 1, 0, 0])
    for ext in ("npz", "pt"):
        p = tmp_path / f"x.{ext}"
        save_feature(p, h, m)
        h2, m2 = load_feature(p)
        np.testing.assert_allclose(h2, h)
        np.testing.assert_array_equal(m2, m)


def test_feature_nan_cleaning(tmp_path):
    h = np.full((3, 2), np.nan, np.float32)
    h[0, 0] = np.inf
    save_feature(tmp_path / "x.npz", h, np.ones(3, np.int64))
    h2, _ = load_feature(tmp_path / "x.npz")
    assert np.isfinite(h2).all() and (h2 == 0).all()


def test_utter_feature_robust_keys(tmp_path):
    import torch

    vec = np.arange(4, dtype=np.float32)
    for key in ("feat", "feats", "embedding", "hidden", "repr"):
        torch.save({key: torch.tensor(vec)}, tmp_path / "u.pt")
        np.testing.assert_allclose(load_utter_feature(tmp_path / "u.pt"), vec)
    torch.save(torch.tensor(vec), tmp_path / "bare.pt")
    np.testing.assert_allclose(load_utter_feature(tmp_path / "bare.pt"), vec)


def test_crop_center():
    x = np.arange(10)[:, None]
    np.testing.assert_array_equal(crop_center(x, 4)[:, 0], [3, 4, 5, 6])
    np.testing.assert_array_equal(crop_center(x, 20), x)


def test_seq_dataset_filtering_and_crop_mask_reset(tmp_path):
    csv, audio, text = make_synthetic_mosei(tmp_path, n=16, max_la=20, max_lt=10)
    df = pd.read_csv(csv)
    # remove one audio file -> row filtered
    victim = df.iloc[0]["uid"]
    (audio / f"{victim}.npz").unlink()
    ds = SeqLevelDataset(df, audio, text, emo_cols=[c for c in df.columns if c.startswith("emo_")],
                         max_len_audio=8, max_len_text=0)
    assert len(ds) == 15
    item = ds[0]
    assert item["h_a"].shape[0] <= 8
    assert not item["mask_a"].any()  # quirk: crop resets mask to all-valid
    assert item["y"].shape == (6,)


def test_utter_dataset_and_label2id(tmp_path):
    csv, audio, text = make_synthetic_iemocap(tmp_path, n=12, d=16)
    df = pd.read_csv(csv)
    ds = UtterLevelDataset(df, audio, text)
    assert len(ds) == 12
    item = ds[0]
    assert item["h_a"].shape == (16,)
    assert isinstance(int(item["y"]), int)
    assert ds.label2id == build_label2id(df["label"])


def test_bucket_batcher_static_shapes(tmp_path):
    csv, audio, text = make_synthetic_mosei(tmp_path, n=20, max_la=20, max_lt=10)
    df = pd.read_csv(csv)
    ds = SeqLevelDataset(df, audio, text, emo_cols=[c for c in df.columns if c.startswith("emo_")])
    bb = BucketBatcher(ds, batch_size=8, la=24, lt=12, drop_last=False)
    shapes = set()
    total_valid = 0
    for batch in bb:
        shapes.add(batch["h_a"].shape)
        total_valid += batch["n_valid"]
        assert batch["mask_a"].dtype == bool
        # padded tail rows are masked... the repeated rows are real dups
        assert batch["h_t"].shape == (8, 12, 300)
    assert shapes == {(8, 24, 74)}  # ONE shape -> one XLA compile
    assert total_valid == 20


def test_bucket_batcher_grad_accum_layout(tmp_path):
    csv, audio, text = make_synthetic_mosei(tmp_path, n=32, max_la=20, max_lt=10)
    df = pd.read_csv(csv)
    ds = SeqLevelDataset(df, audio, text, emo_cols=[c for c in df.columns if c.startswith("emo_")])
    bb = BucketBatcher(ds, batch_size=4, la=24, lt=12, grad_accum=2, drop_last=True)
    batch = next(iter(bb))
    assert batch["h_a"].shape == (2, 4, 24, 74)
    assert batch["y"].shape == (2, 4, 6)


def test_bucket_batcher_shuffle_is_deterministic_per_epoch(tmp_path):
    csv, audio, text = make_synthetic_iemocap(tmp_path, n=16, d=8)
    df = pd.read_csv(csv)
    ds = UtterLevelDataset(df, audio, text, verbose=False)
    bb1 = BucketBatcher(ds, batch_size=4, shuffle=True, seed=5, utter_level=True)
    bb2 = BucketBatcher(ds, batch_size=4, shuffle=True, seed=5, utter_level=True)
    y1 = np.concatenate([b["y"] for b in bb1])
    y2 = np.concatenate([b["y"] for b in bb2])
    np.testing.assert_array_equal(y1, y2)
    # next epoch differs
    y3 = np.concatenate([b["y"] for b in bb1])
    assert not np.array_equal(y1, y3)


def test_prefetch_to_device(tmp_path):
    csv, audio, text = make_synthetic_mosei(tmp_path, n=8, max_la=10, max_lt=6)
    df = pd.read_csv(csv)
    ds = SeqLevelDataset(df, audio, text, emo_cols=[c for c in df.columns if c.startswith("emo_")])
    bb = BucketBatcher(ds, batch_size=4, la=12, lt=8, drop_last=False)
    import jax

    batches = list(prefetch_to_device(iter(bb)))
    assert len(batches) == 2
    assert isinstance(batches[0]["h_a"], jax.Array)
    assert batches[0]["n_valid"] == 4


def test_meta_roundtrip(tmp_path):
    _, audio, _ = make_synthetic_mosei(tmp_path, n=4)
    meta = read_meta(audio)
    assert hidden_dim_from_meta(meta) == 74


def test_host_sharded_batching(tmp_path):
    """Multi-host input: shards are disjoint, cover everything, same shuffle."""
    csv, audio, text = make_synthetic_mosei(tmp_path, n=24, max_la=10, max_lt=6)
    df = pd.read_csv(csv)
    ds = SeqLevelDataset(df, audio, text,
                         emo_cols=[c for c in df.columns if c.startswith("emo_")],
                         verbose=False)
    seen = []
    for host in range(3):
        bb = BucketBatcher(ds, batch_size=4, la=12, lt=8, shuffle=True, seed=7,
                           drop_last=False, host_shard=(host, 3))
        uids = [u for b in bb for u in b["uids"]]
        seen.append(uids)
    flat = [u for host_uids in seen for u in host_uids]
    assert len(flat) == 24
    assert len(set(flat)) == 24  # disjoint and complete
    assert len(BucketBatcher(ds, 4, la=12, lt=8, host_shard=(0, 3))) == 2


def test_host_shards_equal_batch_counts_uneven(tmp_path):
    """Uneven corpus: every host must yield the SAME number of batches, or
    the global-collective train step deadlocks (code-review finding)."""
    csv, audio, text = make_synthetic_mosei(tmp_path, n=22, max_la=10, max_lt=6)
    df = pd.read_csv(csv)
    ds = SeqLevelDataset(df, audio, text,
                         emo_cols=[c for c in df.columns if c.startswith("emo_")],
                         verbose=False)
    for drop_last in (True, False):
        counts = []
        for host in range(3):
            bb = BucketBatcher(ds, batch_size=4, la=12, lt=8, shuffle=True,
                               seed=7, drop_last=drop_last, host_shard=(host, 3))
            n_batches = sum(1 for _ in bb)
            assert n_batches == len(bb)
            counts.append(n_batches)
        assert len(set(counts)) == 1, (drop_last, counts)

    # malformed host_shard rejected at construction
    for bad in ((-1, 3), (3, 3), (0, 0)):
        with pytest.raises(ValueError):
            BucketBatcher(ds, 4, la=12, lt=8, host_shard=bad)
