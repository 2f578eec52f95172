"""C++ feature loader vs the Python loader — identical semantics, same data."""

import numpy as np
import pytest

from hriemo import native
from hriemo.data.feature_store import save_feature

pytestmark = pytest.mark.skipif(
    not native.is_available(), reason="native loader did not build"
)


def _write_corpus(tmp_path, n=6, dmax=16):
    rng = np.random.default_rng(0)
    paths, lens, hiddens, masks = [], [], [], []
    for i in range(n):
        L = int(rng.integers(3, 12))
        h = rng.standard_normal((L, dmax)).astype(np.float32)
        if i == 0:
            h[1, :] = np.nan  # must be cleaned
        m = np.ones(L, np.int64)
        m[L - 1] = 0  # last frame padded in-file
        p = tmp_path / f"u{i}.npz"
        save_feature(p, h, m)
        paths.append(str(p))
        lens.append(L)
        hiddens.append(np.nan_to_num(h))
        masks.append(m)
    return paths, lens, hiddens, masks


def test_matches_python_loader(tmp_path):
    paths, lens, hiddens, masks = _write_corpus(tmp_path)
    bucket = 10
    hid, pad = native.assemble_modality(paths, bucket, 16, max_len=0)
    for i, (L, h, m) in enumerate(zip(lens, hiddens, masks)):
        copy = min(L, bucket)
        np.testing.assert_allclose(hid[i, :copy], h[:copy], atol=0)
        assert (hid[i, copy:] == 0).all()
        # stored 0 -> PAD; tail beyond L -> PAD
        expected_pad = np.ones(bucket, bool)
        expected_pad[:copy] = m[:copy] == 0
        np.testing.assert_array_equal(pad[i], expected_pad)
    # NaN row cleaned to zero
    assert (hid[0, 1] == 0).all()


def test_center_crop_and_mask_reset(tmp_path):
    rng = np.random.default_rng(1)
    h = rng.standard_normal((20, 8)).astype(np.float32)
    p = tmp_path / "x.npz"
    save_feature(p, h, np.ones(20, np.int64))
    hid, pad = native.assemble_modality([str(p)], 6, 8, max_len=6)
    # center crop rows 7..12 (start = (20-6)//2 = 7)
    np.testing.assert_allclose(hid[0], h[7:13], atol=0)
    assert not pad[0].any()  # crop quirk: mask reset to all-valid


def test_npy_vector_and_f64(tmp_path):
    v = np.arange(8, dtype=np.float64)
    np.save(tmp_path / "v.npy", v)
    hid, pad = native.assemble_modality([str(tmp_path / "v.npy")], 1, 8)
    np.testing.assert_allclose(hid[0, 0], v.astype(np.float32))
    assert not pad[0, 0]


def test_missing_file_raises(tmp_path):
    with pytest.raises(IOError):
        native.assemble_modality([str(tmp_path / "nope.npz")], 4, 8)


def test_wrong_dim_raises(tmp_path):
    save_feature(tmp_path / "a.npz", np.zeros((3, 5), np.float32), np.ones(3, np.int64))
    with pytest.raises(IOError):
        native.assemble_modality([str(tmp_path / "a.npz")], 4, 8)


def test_threaded_large_batch(tmp_path):
    paths, lens, hiddens, _ = _write_corpus(tmp_path, n=64)
    hid, pad = native.assemble_modality(paths * 4, 12, 16, n_threads=8)
    assert hid.shape == (256, 12, 16)
    np.testing.assert_allclose(hid[0, : min(lens[0], 12)], hiddens[0][:12], atol=0)


def test_native_batcher_matches_python_batcher(tmp_path):
    import pandas as pd
    from hriemo.data import BucketBatcher, SeqLevelDataset
    from hriemo.data.synthetic import make_synthetic_mosei

    csv, audio, text = make_synthetic_mosei(tmp_path, n=16, max_la=20, max_lt=10)
    df = pd.read_csv(csv)
    emo = [c for c in df.columns if c.startswith("emo_")]
    ds = SeqLevelDataset(df, audio, text, emo_cols=emo,
                         max_len_audio=12, max_len_text=0, verbose=False)
    py = BucketBatcher(ds, 8, la=16, lt=12, drop_last=False)
    nat = BucketBatcher(ds, 8, la=16, lt=12, drop_last=False, native=True)
    assert nat.native
    for bp, bn in zip(py, nat):
        assert bn["uids"] == bp["uids"]
        np.testing.assert_allclose(bn["h_a"], bp["h_a"], atol=0)
        np.testing.assert_allclose(bn["h_t"], bp["h_t"], atol=0)
        np.testing.assert_array_equal(bn["mask_a"], bp["mask_a"])
        np.testing.assert_array_equal(bn["mask_t"], bp["mask_t"])
        np.testing.assert_allclose(bn["y"], bp["y"], atol=0)


def test_native_loader_throughput(tmp_path):
    """Native assembly must not be slower than the Python path (sanity)."""
    import time
    import pandas as pd
    from hriemo.data import BucketBatcher, SeqLevelDataset
    from hriemo.data.synthetic import make_synthetic_mosei

    csv, audio, text = make_synthetic_mosei(tmp_path, n=128, max_la=60, max_lt=30)
    df = pd.read_csv(csv)
    emo = [c for c in df.columns if c.startswith("emo_")]
    ds = SeqLevelDataset(df, audio, text, emo_cols=emo, verbose=False)

    def run(native):
        bb = BucketBatcher(ds, 32, la=64, lt=32, drop_last=False, native=native)
        t0 = time.perf_counter()
        for _ in range(3):
            for _ in bb:
                pass
        return time.perf_counter() - t0

    t_native = run(True)
    t_python = run(False)
    print(f"native {t_native*1000:.0f} ms vs python {t_python*1000:.0f} ms "
          f"({t_python/t_native:.1f}x)")
    assert t_native < t_python * 1.5  # allow noise; typically much faster
