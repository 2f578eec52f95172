#!/usr/bin/env python3
"""CLI wrapper — same entry point location as the reference script
(reference: scripts/mosei_feature_extraction_seq_level/extract_text_feats_from_csd.py). Logic lives in hriemo.dataprep.extract_mosei."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from hriemo.dataprep.extract_mosei import main  # noqa: E402

if __name__ == "__main__":
    main(["--modality", "text"] + sys.argv[1:])
