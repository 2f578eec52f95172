#!/usr/bin/env python3
"""Bar plot of calibrated thresholds (reference: tools/mosei_plot_thresholds.py)."""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from hriemo.data.synthetic import MOSEI_EMO_COLS as _COLS  # noqa: E402

EMO_COLS = [c.replace("emo_", "") for c in _COLS]


def main(argv=None):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", type=str, required=True)
    ap.add_argument("--out", type=str, default="figs/thresholds.png")
    args = ap.parse_args(argv)

    from hriemo.utils.checkpoint import load_torch_checkpoint

    ths = load_torch_checkpoint(args.ckpt).get("val_calibrated_thresholds")
    if ths is None:
        raise SystemExit("checkpoint has no val_calibrated_thresholds")
    ths = np.asarray(ths)

    fig, ax = plt.subplots(figsize=(6, 4))
    ax.bar(range(len(ths)), ths)
    ax.set_xticks(range(len(ths)), EMO_COLS[: len(ths)], rotation=30)
    ax.set_ylabel("calibrated threshold")
    fig.tight_layout()
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(out, dpi=120)
    print(f"[Saved] {out}")
    return out


if __name__ == "__main__":
    main()
