#!/usr/bin/env python3
"""Package the official CMU-MOSEI standard folds into this repo — run ONCE
on any machine that has mmsdk installed or a CMU-MultimodalSDK checkout.

    python -m tools.export_mosei_standard_folds [--sdk PATH] [--out PATH]

After this, ``python -m hriemo.dataprep.mosei_index`` reproduces the
reference's split membership
(ref: scripts/mosei_feature_extraction_seq_level/build_mosei_index_splits.py:31-49)
with no user-supplied folds file. The fold lists are public constants; the
build environment for this repo has no network/mmsdk, which is the only
reason they are not committed directly (see hriemo/dataprep/standard_folds.py).
"""

import argparse
import sys

sys.path.insert(0, ".")

from hriemo.dataprep.standard_folds import (  # noqa: E402
    PACKAGED_FOLDS,
    FoldsUnavailable,
    export_packaged_folds,
    folds_from_mmsdk,
    folds_from_sdk_checkout,
)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--sdk", type=str, default=None,
                    help="path to a CMU-MultimodalSDK checkout (or directly "
                         "to cmu_mosei_std_folds.py); default: import mmsdk")
    ap.add_argument("--out", type=str, default=str(PACKAGED_FOLDS))
    args = ap.parse_args(argv)

    if args.sdk:
        folds = folds_from_sdk_checkout(args.sdk)
    else:
        try:
            folds = folds_from_mmsdk()
        except ImportError:
            raise SystemExit(
                "mmsdk is not importable — pass --sdk PATH to a "
                "CMU-MultimodalSDK checkout instead")
        except FoldsUnavailable as e:
            raise SystemExit(str(e))
    return export_packaged_folds(folds, args.out)


if __name__ == "__main__":
    main()
