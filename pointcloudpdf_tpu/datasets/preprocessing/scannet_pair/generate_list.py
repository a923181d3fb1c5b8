"""Collect high-overlap frame pairs across all scenes.

Reference contract: pointcept/datasets/preprocessing/scannet/scannet_pair/
generage_list.py [sic] — concatenate every scene's ``pcd/overlap.txt``
and keep rows with ratio >= 0.3 into ``<root>/overlap30.txt``.
"""

from __future__ import annotations

import argparse
import glob
import os


def generate_overlap_list(target_dir, threshold=0.3):
    out_path = os.path.join(target_dir, "overlap30.txt")
    kept = 0
    with open(out_path, "w") as out:
        for overlap_file in sorted(
            glob.glob(os.path.join(target_dir, "*", "pcd", "overlap.txt"))
        ):
            with open(overlap_file) as f:
                for line in f:
                    parts = line.split()
                    if len(parts) == 3 and float(parts[2]) >= threshold:
                        out.write(line if line.endswith("\n") else line + "\n")
                        kept += 1
    return out_path, kept


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--target_dir", required=True)
    parser.add_argument("--threshold", type=float, default=0.3)
    args = parser.parse_args()
    path, kept = generate_overlap_list(args.target_dir, args.threshold)
    print(f"wrote {kept} pairs to {path}")


if __name__ == "__main__":
    main()
