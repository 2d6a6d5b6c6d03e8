#!/usr/bin/env python
"""λ-sweep launcher: loops (scene, λ) pairs shelling out to train.py.

Equivalent of the reference launchers (/root/reference/scripts/train_*.py):
per-dataset presets are applied via --preset; sweeps produce the two
rate-distortion points published in the reference CSVs (λ=0.004 lowrate,
λ=0.0005 highrate) plus any extras requested.

Usage:
    python scripts/sweep.py --dataset mipnerf360 --data_root /data/360 \
        --scenes bicycle garden --lmbdas 0.004 0.0005 --out outputs/360
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

PRESETS = {
    "mipnerf360": dict(preset="mipnerf360"),
    "tandt": dict(preset="tandt"),
    "deep_blending": dict(preset="deep_blending"),
    "nerf_synthetic": dict(preset="nerf_synthetic"),
    "bungeenerf": dict(preset="bungeenerf"),
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", required=True, choices=sorted(PRESETS))
    p.add_argument("--data_root", required=True)
    p.add_argument("--scenes", nargs="+", required=True)
    p.add_argument("--lmbdas", nargs="+", type=float,
                   default=[0.004, 0.0005])
    p.add_argument("--out", default="outputs")
    p.add_argument("--iterations", type=int, default=30_000)
    p.add_argument("--extra", nargs=argparse.REMAINDER, default=[])
    args = p.parse_args()

    for scene in args.scenes:
        for lm in args.lmbdas:
            model_path = os.path.join(args.out, args.dataset, scene,
                                      f"lmbda_{lm}")
            cmd = [sys.executable, "train.py",
                   "-s", os.path.join(args.data_root, scene),
                   "-m", model_path,
                   "--preset", PRESETS[args.dataset]["preset"],
                   "--lmbda", str(lm),
                   "--iterations", str(args.iterations)] + args.extra
            print("+", " ".join(cmd), flush=True)
            ret = subprocess.run(cmd).returncode
            if ret != 0:
                print(f"FAILED: {scene} λ={lm} (exit {ret})", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
