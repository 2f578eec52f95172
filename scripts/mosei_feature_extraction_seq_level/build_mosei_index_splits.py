#!/usr/bin/env python3
"""CLI wrapper — same entry point location as the reference script
(reference: scripts/mosei_feature_extraction_seq_level/build_mosei_index_splits.py). Logic lives in hriemo.dataprep.mosei_index."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from hriemo.dataprep.mosei_index import main  # noqa: E402

if __name__ == "__main__":
    main()
