#!/usr/bin/env python3
"""CLI wrapper — same entry point location as the reference script
(reference: scripts/iemocap_feature_extraction_seq_level/analyze_length_distribution.py). Logic lives in hriemo.dataprep.integrity."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from hriemo.dataprep.integrity import main  # noqa: E402

if __name__ == "__main__":
    main(["lengths"] + sys.argv[1:])
