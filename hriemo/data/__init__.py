from .feature_store import (
    load_feature,
    load_utter_feature,
    save_feature,
    read_meta,
    write_meta,
)
from .datasets import SeqLevelDataset, UtterLevelDataset, crop_center, build_label2id
from .batching import BucketBatcher, pad_batch, prefetch_to_device

__all__ = [
    "load_feature",
    "load_utter_feature",
    "save_feature",
    "read_meta",
    "write_meta",
    "SeqLevelDataset",
    "UtterLevelDataset",
    "crop_center",
    "build_label2id",
    "BucketBatcher",
    "pad_batch",
    "prefetch_to_device",
]
