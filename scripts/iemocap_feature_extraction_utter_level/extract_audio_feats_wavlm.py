#!/usr/bin/env python3
"""CLI wrapper — same entry point location as the reference script
(reference: scripts/iemocap_feature_extraction_utter_level/extract_audio_feats_wavlm.py). Logic lives in hriemo.dataprep.extract_iemocap."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from hriemo.dataprep.extract_iemocap import main  # noqa: E402

if __name__ == "__main__":
    main(["--modality", "audio", "--level", "utter"] + sys.argv[1:])
