#!/usr/bin/env python3
"""CLI wrapper — same entry point location as the reference script
(reference: scripts/fusion/train_fusion_seq_level_decoder.py). Logic lives in hriemo.train.train_fusion_seq_level_decoder."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from hriemo.train.train_fusion_seq_level_decoder import main  # noqa: E402

if __name__ == "__main__":
    main()
