#!/bin/bash
# Round-5 RD sweep: two more rate points (λ=0.001, λ=0.002), each branched
# from the λ=0.004 run's iter-10000 checkpoint (the schedule is λ-independent
# until the context phase begins at iter 10000 — see r4_branch_l2.sh).
# These runs train with the round-5 kept-set context fix (train/step.py), so
# their encode-time bits should match the training estimate within ~2%
# (verified by scripts/codec_diag.py afterwards).
#
# Usage: DEADLINE_TS=<epoch-seconds> bash scripts/r5_rd_queue.sh [out=/root/r4_bench]
set -u
OUT=${1:-/root/r4_bench}
DEADLINE_TS=${DEADLINE_TS:-$(( $(date +%s) + 21600 ))}
cd "$(dirname "$0")/.."

run_point() {
  LM=$1
  DIR="$OUT/l$LM"
  NOW=$(date +%s)
  LEFT=$(( DEADLINE_TS - NOW ))
  if [ "$LEFT" -lt 900 ]; then
    echo "deadline reached; skipping l$LM" >> "$OUT/r5_queue.log"
    return 1
  fi
  TMO=$(( LEFT < 10800 ? LEFT : 10800 ))
  echo "=== l$LM start $(date) timeout ${TMO}s ===" >> "$OUT/r5_queue.log"
  timeout "$TMO" python train.py -s "$OUT/scene" -m "$DIR" \
      --iterations 30000 --lmbda "$LM" --voxel_size 0.01 --no_tensorboard \
      --train_vis_cap 524288 --anchor_capacity 163840 \
      --checkpoint_iterations 15000 20000 25000 \
      --start_checkpoint "$OUT/l0.004/chkpnt10000.pkl" \
      >> "$OUT/r5_queue.log" 2>&1
  RC=$?
  python - "$OUT" "$LM" "$RC" <<'EOF'
import json, os, sys
out, lm, rc = sys.argv[1], float(sys.argv[2]), int(sys.argv[3])
run = os.path.join(out, f"l{lm:g}")
entry = dict(lmbda=lm, iters=30000, rc=rc,
             branched_from="l0.004/chkpnt10000", round=5)
for name, key in (("progress.json", "last_progress"),
                  ("results.json", "results")):
    p = os.path.join(run, name)
    if os.path.exists(p):
        entry[key] = json.load(open(p))
with open(os.path.join(out, "summary.jsonl"), "a") as f:
    f.write(json.dumps(entry) + "\n")
print("summary appended for", lm, "rc", rc)
EOF
}

# wait until no other TPU training run holds the chip (mesh_force_cpu /
# force_cpu runs don't touch the chip and must not block the queue)
while pgrep -af "python train.py" | grep -v "force_cpu" | grep -q "lmbda"; do
  sleep 60
done

run_point 0.001
run_point 0.002
echo "=== queue done $(date) ===" >> "$OUT/r5_queue.log"
