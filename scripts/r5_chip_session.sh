#!/bin/bash
# Round-5 chip schedule: wait for the in-flight λ=0.0005 RD run to release
# the single chip, then run the bounded measurement sweeps on a QUIET chip
# (the round-4 fps/thr numbers were contaminated by contention with the
# λ=0.0005 launch — see /root/r4_bench/measure.log timestamps), then hand
# the chip to the remaining RD rate points until the deadline.
#
# Usage: DEADLINE_TS=<epoch> nohup bash scripts/r5_chip_session.sh &
set -u
LOG=/root/r5_measure.log
DEADLINE_TS=${DEADLINE_TS:-$(( $(date +%s) + 18000 ))}
cd "$(dirname "$0")/.."

while pgrep -af "python train.py" | grep -v "force_cpu" | grep -q "lmbda"; do
  sleep 60
done
echo "=== chip free $(date) ===" >> "$LOG"

echo "=== bench baseline $(date) ===" >> "$LOG"
timeout 900 python bench.py >> "$LOG" 2>&1

echo "=== corner_diag $(date) ===" >> "$LOG"
timeout 900 python scripts/corner_diag.py >> "$LOG" 2>&1

echo "=== fps_bench $(date) ===" >> "$LOG"
timeout 1500 python scripts/fps_bench.py --anchors 100000 --views 32 >> "$LOG" 2>&1

echo "=== thr_sweep $(date) ===" >> "$LOG"
timeout 2700 python scripts/thr_sweep.py --iters 15 >> "$LOG" 2>&1

echo "=== launching RD queue $(date), deadline $DEADLINE_TS ===" >> "$LOG"
DEADLINE_TS=$DEADLINE_TS bash scripts/r5_rd_queue.sh /root/r4_bench
echo "=== session done $(date) ===" >> "$LOG"
