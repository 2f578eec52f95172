"""Static-shape batching + double-buffered device feed.

This is the one place the rebuild deliberately diverges from the reference
(SURVEY.md §7 step 5): the reference pads each batch to its own max length
(collate at train_mosei_...py:295-334), which would force an XLA recompile
per unique length. Here every batch is padded to a fixed **bucket**
(default: the training caps, e.g. 300/128), so the train step compiles
once. Padded positions carry True in the pad mask, so the numerics under
masking are identical to dynamic padding.

``prefetch_to_device`` keeps one batch in flight (host→HBM copy overlapped
with the previous step's compute) — the double-buffered feed of
BASELINE.json's streaming-inference config.
"""

from __future__ import annotations

import numpy as np


def pad_batch(items: list[dict], la: int, lt: int, label_dtype=None) -> dict:
    """Stack seq-level items into fixed [B, la]/[B, lt] arrays (True=PAD)."""
    b = len(items)
    d_a = items[0]["h_a"].shape[-1]
    d_t = items[0]["h_t"].shape[-1]
    h_a = np.zeros((b, la, d_a), np.float32)
    h_t = np.zeros((b, lt, d_t), np.float32)
    mask_a = np.ones((b, la), bool)
    mask_t = np.ones((b, lt), bool)
    for i, it in enumerate(items):
        na = min(it["h_a"].shape[0], la)
        nt = min(it["h_t"].shape[0], lt)
        h_a[i, :na] = it["h_a"][:na]
        h_t[i, :nt] = it["h_t"][:nt]
        mask_a[i, :na] = it["mask_a"][:na]
        mask_t[i, :nt] = it["mask_t"][:nt]
    out = {"h_a": h_a, "h_t": h_t, "mask_a": mask_a, "mask_t": mask_t}
    if "y" in items[0]:
        out["y"] = np.stack([np.asarray(it["y"]) for it in items]).astype(
            label_dtype or np.asarray(items[0]["y"]).dtype
        )
    return out


def stack_utter_batch(items: list[dict]) -> dict:
    return {
        "h_a": np.stack([it["h_a"] for it in items]).astype(np.float32),
        "h_t": np.stack([it["h_t"] for it in items]).astype(np.float32),
        "y": np.asarray([it["y"] for it in items], np.int64),
    }


class BucketBatcher:
    """Iterates a dataset in fixed-shape batches.

    * ``drop_last=True`` (training): partial tail batch is dropped so the
      compiled step sees one shape.
    * ``drop_last=False`` (eval): the tail batch is padded by repeating the
      last item; ``n_valid`` says how many rows are real so the caller can
      slice host-side.
    * ``grad_accum > 1``: yields batches with leading layout
      ``[accum, micro, ...]`` matching the train step's scan.
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        la: int = 0,
        lt: int = 0,
        shuffle: bool = False,
        seed: int = 0,
        drop_last: bool = True,
        grad_accum: int = 1,
        utter_level: bool = False,
        native: bool = False,
        host_shard: tuple[int, int] | None = None,
    ):
        self.ds = dataset
        self.batch_size = batch_size
        self.la, self.lt = la, lt
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.grad_accum = grad_accum
        self.utter_level = utter_level
        # multi-host SPMD input: each host iterates a disjoint slice of the
        # (identically shuffled) index — pass (jax.process_index(),
        # jax.process_count()); the per-host batch then feeds that host's
        # local devices under the global mesh. Shards are equalised (see
        # _host_order) so every host yields the SAME number of batches —
        # unequal counts would deadlock the global-collective train step.
        if host_shard is not None:
            hidx, hcount = host_shard
            if not (isinstance(hidx, int) and isinstance(hcount, int)
                    and 0 <= hidx < hcount):
                raise ValueError(f"host_shard must be (index, count) with "
                                 f"0 <= index < count, got {host_shard}")
        self.host_shard = host_shard
        self.epoch = 0
        # C++ threaded batch assembly (native/feature_loader.cpp): needs a
        # path-backed seq-level dataset; silently falls back otherwise.
        self.native = False
        self._native_dims = None
        if native and not utter_level and hasattr(dataset, "_paths"):
            from .. import native as native_mod

            paths_ok = len(dataset) > 0 and all(
                str(p).endswith((".npy", ".npz"))
                for p in dataset._paths[0])  # C++ loader reads npy/npz only
            self.native = paths_ok and native_mod.is_available()
            if self.native:
                item0 = dataset[0]
                self._native_dims = (item0["h_a"].shape[-1], item0["h_t"].shape[-1])

    def _host_n(self) -> int:
        """Per-host item count (equal on every host)."""
        n = len(self.ds)
        if self.host_shard is None:
            return n
        _, hcount = self.host_shard
        if self.drop_last:
            return n // hcount          # truncate: all hosts equal
        return -(-n // hcount)          # pad by wrapping: all hosts equal

    def _host_order(self, order: np.ndarray) -> np.ndarray:
        if self.host_shard is None:
            return order
        hidx, hcount = self.host_shard
        per_host = self._host_n()
        if self.drop_last:
            order = order[: per_host * hcount]
        else:
            target = per_host * hcount
            if len(order) < target:
                order = np.resize(order, target)  # cyclic wrap, any deficit
        return order[hidx::hcount]

    def _native_batch(self, idx) -> dict:
        from .. import native as native_mod

        ds = self.ds
        paths_a = [str(ds._paths[int(i)][0]) for i in idx]
        paths_t = [str(ds._paths[int(i)][1]) for i in idx]
        d_a, d_t = self._native_dims
        h_a, mask_a = native_mod.assemble_modality(
            paths_a, self.la, d_a, max_len=ds.max_len_audio)
        h_t, mask_t = native_mod.assemble_modality(
            paths_t, self.lt, d_t, max_len=ds.max_len_text)
        out = {"h_a": h_a, "h_t": h_t, "mask_a": mask_a, "mask_t": mask_t}
        ys = [ds._labels(ds.df.iloc[int(i)]) for i in idx]
        if ys[0] is not None:
            out["y"] = np.stack([np.asarray(y) for y in ys])
        return out

    def __len__(self):
        full = self.batch_size * self.grad_accum
        n = self._host_n()
        return n // full if self.drop_last else -(-n // full)

    def __iter__(self):
        order = np.arange(len(self.ds))
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(order)
        order = self._host_order(order)
        n = len(order)
        self.epoch += 1

        full = self.batch_size * self.grad_accum
        stop = (n // full) * full if self.drop_last else n
        for start in range(0, stop, full):
            idx = order[start : start + full]
            n_valid = len(idx)
            if n_valid < full:  # eval tail: repeat last item
                idx = np.concatenate([idx, np.full(full - n_valid, idx[-1])])
            if self.native:
                batch = self._native_batch(idx)
            else:
                items = [self.ds[int(i)] for i in idx]
                if self.utter_level:
                    batch = stack_utter_batch(items)
                    batch["mask_a"] = np.zeros((full, 1), bool)
                    batch["mask_t"] = np.zeros((full, 1), bool)
                    batch["h_a"] = batch["h_a"][:, None, :]
                    batch["h_t"] = batch["h_t"][:, None, :]
                else:
                    batch = pad_batch(items, self.la, self.lt)
            if self.grad_accum > 1:
                batch = {
                    k: v.reshape((self.grad_accum, self.batch_size) + v.shape[1:])
                    for k, v in batch.items()
                }
            batch["n_valid"] = n_valid
            if self.native:
                uid_col = self.ds.uid_col
                batch["uids"] = [str(self.ds.df.iloc[int(i)][uid_col])
                                 for i in idx[:n_valid]]
            else:
                batch["uids"] = [it.get("uid") for it in items[:n_valid]]
            yield batch


def prefetch_to_device(iterator, device=None):
    """Keep one batch in flight on the device (double buffering)."""
    import jax

    pending = None
    meta = None
    for batch in iterator:
        aux = {k: batch.pop(k) for k in ("n_valid", "uids") if k in batch}
        nxt = jax.device_put(batch, device)
        if pending is not None:
            out = dict(pending)
            out.update(meta)
            yield out
        pending, meta = nxt, aux
    if pending is not None:
        out = dict(pending)
        out.update(meta)
        yield out
