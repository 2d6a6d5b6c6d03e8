#!/usr/bin/env python
"""Aggregate per-run results.json files into a CSV.

Equivalent of the reference's log-scraping aggregator
(/root/reference/utils/deal_result.py) but reads the structured results.json
written by train.py/test.py/decompress.py instead of parsing logs.
"""

from __future__ import annotations

import argparse
import csv
import glob
import json
import os
import sys


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root", required=True, help="outputs directory to scan")
    p.add_argument("--out", default="results.csv")
    args = p.parse_args()

    rows = []
    for path in sorted(glob.glob(os.path.join(args.root, "**", "results.json"),
                                 recursive=True)):
        with open(path) as f:
            data = json.load(f)
        run = os.path.relpath(os.path.dirname(path), args.root)
        for name, m in data.items():
            rows.append(dict(run=run, variant=name,
                             PSNR=m.get("PSNR"), SSIM=m.get("SSIM"),
                             LPIPS=m.get("LPIPS"), FPS=m.get("FPS"),
                             size_MB=m.get("size_MB")))
    if not rows:
        print("no results.json found under", args.root)
        return 1
    with open(args.out, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0]))
        w.writeheader()
        w.writerows(rows)
    print(f"wrote {len(rows)} rows to {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
