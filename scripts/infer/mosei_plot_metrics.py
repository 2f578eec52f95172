#!/usr/bin/env python3
"""CLI wrapper — same entry point location as the reference script
(reference: scripts/infer/mosei_plot_metrics.py). Logic lives in hriemo.infer.mosei_plot_metrics."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from hriemo.infer.mosei_plot_metrics import main  # noqa: E402

if __name__ == "__main__":
    main()
