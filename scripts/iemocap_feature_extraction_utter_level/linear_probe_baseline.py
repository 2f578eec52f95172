#!/usr/bin/env python3
"""CLI wrapper — same entry point location as the reference script
(reference: scripts/iemocap_feature_extraction_utter_level/linear_probe_baseline.py). Logic lives in hriemo.train.linear_probe_baseline."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from hriemo.train.linear_probe_baseline import main  # noqa: E402

if __name__ == "__main__":
    main()
