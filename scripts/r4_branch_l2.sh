#!/bin/bash
# Second RD rate point, branched from the first run's iter-10000 checkpoint.
#
# The training schedule is λ-independent until the context phase begins at
# iter 10000 (the rate term λ·bit_per_param only enters the loss for
# phase == "context", train/step.py; ref train.py:199-209 adds it only once
# multi_scale_generating runs) — so both rate points share iterations
# 1..10000 bit-exactly and the second point only needs the 20k context
# iterations. Resume restores the camera RNG, step key, pending camera
# order, and doubled budget from the checkpoint meta, so the branched run
# is identical to a continuous λ=0.0005 run.
#
# Usage: bash scripts/r4_branch_l2.sh [out_dir=/root/r4_bench]
set -e
OUT=${1:-/root/r4_bench}
cd "$(dirname "$0")/.."
timeout 10800 python train.py -s "$OUT/scene" -m "$OUT/l0.0005" \
    --iterations 30000 --lmbda 0.0005 --voxel_size 0.01 --no_tensorboard \
    --train_vis_cap 524288 --anchor_capacity 163840 \
    --checkpoint_iterations 20000 25000 \
    --start_checkpoint "$OUT/l0.004/chkpnt10000.pkl" 2>&1 \
    | tee -a "$OUT/l2_branch.log"
python - "$OUT" <<'EOF'
import json, os, sys
out = sys.argv[1]
run = os.path.join(out, "l0.0005")
entry = dict(lmbda=0.0005, iters=30000, branched_from="l0.004/chkpnt10000")
for name, key in (("progress.json", "last_progress"),
                  ("results.json", "results")):
    p = os.path.join(run, name)
    if os.path.exists(p):
        entry[key] = json.load(open(p))
with open(os.path.join(out, "summary.jsonl"), "a") as f:
    f.write(json.dumps(entry) + "\n")
print("summary appended")
EOF
