#!/usr/bin/env python
"""Round-3 hard-benchmark suite (VERDICT r2 next #2).

Generates the hard synthetic scene once (512x512, 120 cams, 80k GT
gaussians), then runs the FULL default training schedule per rate point —
30k iterations, noise_from=3000, context_from=10000, update_until=15000 —
through estimate -> encode -> decode -> render-from-decoded -> metrics,
appending one summary line per completed run to <out>/summary.jsonl
(restartable: completed runs are skipped on relaunch).

Usage:
  python scripts/r3_suite.py [--out /root/r3_bench] [--iters 30000]
      [--lmbdas 0.001,0.004,0.0005,0.002]
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def sh(cmd, log_path):
    print(f"+ {' '.join(cmd)}", flush=True)
    with open(log_path, "a") as f:
        f.write(f"\n+ {' '.join(cmd)}\n")
        f.flush()
        return subprocess.run(cmd, stdout=f, stderr=subprocess.STDOUT,
                              cwd=REPO).returncode


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/root/r3_bench")
    ap.add_argument("--scene", default=None)
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--cams", type=int, default=120)
    ap.add_argument("--gauss", type=int, default=80_000)
    ap.add_argument("--points", type=int, default=120_000)
    ap.add_argument("--iters", type=int, default=30_000)
    ap.add_argument("--voxel_size", type=float, default=0.01)
    ap.add_argument("--lmbdas", default="0.001,0.004,0.0005,0.002")
    ap.add_argument("--extra_flags", default="",
                    help="extra train.py flags, space-separated "
                         "(e.g. '--train_vis_cap 524288')")
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    scene = args.scene or os.path.join(args.out, "scene")
    suite_log = os.path.join(args.out, "suite.log")
    summary = os.path.join(args.out, "summary.jsonl")

    if not os.path.exists(os.path.join(scene, "sparse/0/points3D.bin")):
        rc = sh([sys.executable, "scripts/make_synth_scene.py",
                 "--out", scene, "--res", str(args.res),
                 "--cams", str(args.cams), "--gauss", str(args.gauss),
                 "--points", str(args.points)], suite_log)
        if rc != 0:
            print("scene generation FAILED", flush=True)
            return 1

    # a killed suite must still leave evidence (VERDICT r3 #7): SIGTERM is
    # converted to an exception so the finally-block below records the
    # in-flight run's last heartbeat before exiting
    import signal

    def _term(signum, frame):
        raise KeyboardInterrupt(f"signal {signum}")

    signal.signal(signal.SIGTERM, _term)

    for lm in [float(x) for x in args.lmbdas.split(",")]:
        run_dir = os.path.join(args.out, f"l{lm:g}")
        res_path = os.path.join(run_dir, "results.json")
        if os.path.exists(res_path):
            print(f"skip λ={lm:g} (done)", flush=True)
            continue
        t0 = time.time()
        rc = None
        try:
            rc = sh([sys.executable, "train.py", "-s", scene, "-m", run_dir,
                     "--iterations", str(args.iters), "--lmbda", f"{lm:g}",
                     "--voxel_size", str(args.voxel_size), "--no_tensorboard"]
                    + args.extra_flags.split(), suite_log)
        finally:
            wall = time.time() - t0
            entry = dict(lmbda=lm, iters=args.iters, wall_s=round(wall, 1),
                         rc=rc if rc is not None else "killed")
            prog_path = os.path.join(run_dir, "progress.json")
            if os.path.exists(prog_path):
                with open(prog_path) as f:
                    entry["last_progress"] = json.load(f)
            if rc == 0 and os.path.exists(res_path):
                with open(res_path) as f:
                    entry["results"] = json.load(f)
            with open(summary, "a") as f:
                f.write(json.dumps(entry) + "\n")
            print(f"λ={lm:g}: rc={rc} in {wall:.0f}s", flush=True)
    print("suite done", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
