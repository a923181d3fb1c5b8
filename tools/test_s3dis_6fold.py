"""S3DIS 6-fold evaluation: merge per-area test records.

Reference contract (tools/test_s3dis_6fold.py): each per-area test run
saves its class intersection/union/target record; this tool sums them
over the six areas and reports the 6-fold mIoU/mAcc/allAcc.  Our
SemSegTester writes ``<split>.pickle`` under ``<exp>/result``.
"""

import argparse
import glob
import os
import pickle

import numpy as np

CLASS_NAMES = [
    "ceiling", "floor", "wall", "beam", "column", "window", "door",
    "table", "chair", "sofa", "bookcase", "board", "clutter",
]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--record_root",
        required=True,
        help="directory containing per-area record pickles "
             "(e.g. exp/s3dis/semseg-*/result)",
    )
    args = parser.parse_args()
    records = sorted(
        glob.glob(os.path.join(args.record_root, "**", "Area_*.pickle"),
                  recursive=True)
    )
    assert records, f"no Area_*.pickle records under {args.record_root}"
    print(f"Merging {len(records)} area records:")
    inter = union = target = 0
    for path in records:
        with open(path, "rb") as f:
            rec = pickle.load(f)
        print(f"  {path}")
        inter = inter + rec["intersection"]
        union = union + rec["union"]
        target = target + rec["target"]
    iou_class = inter / np.maximum(union, 1e-10)
    acc_class = inter / np.maximum(target, 1e-10)
    print(
        f"6-fold result: mIoU/mAcc/allAcc "
        f"{np.mean(iou_class):.4f}/{np.mean(acc_class):.4f}/"
        f"{inter.sum() / max(target.sum(), 1e-10):.4f}"
    )
    for i, name in enumerate(CLASS_NAMES[: len(iou_class)]):
        print(f"Class_{i}-{name}: iou/acc {iou_class[i]:.4f}/{acc_class[i]:.4f}")


if __name__ == "__main__":
    main()
