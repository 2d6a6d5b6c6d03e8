#!/bin/bash
# Round-5 end-of-round sequence (run after the RD queue deadline, chip free):
# golden kernel tests on the real chip, round-5 re-encode + decoded render of
# every completed rate point (test.py from the latest checkpoint — exercises
# the r5 codec: kept-set contexts are baked into the retrained points,
# cost-modeled windows + int16 escapes into all of them), per-point
# estimate-vs-actual audit, RD aggregation, final bench.
set -u
OUT=${1:-/root/r4_bench}
LOG=/root/r5_finalize.log
cd "$(dirname "$0")/.."

echo "=== golden TPU tests $(date) ===" >> "$LOG"
CONTEXTGS_TEST_TPU=1 timeout 900 python -m pytest tests -m tpu -q >> "$LOG" 2>&1

for LM in 0.004 0.0005 0.001 0.002; do
  DIR="$OUT/l$LM"
  [ -d "$DIR" ] || continue
  ls "$DIR"/chkpnt*.pkl >/dev/null 2>&1 || { echo "no ckpt in $DIR" >> "$LOG"; continue; }
  echo "=== test.py l$LM $(date) ===" >> "$LOG"
  timeout 1800 python test.py -s "$OUT/scene" -m "$DIR" >> "$LOG" 2>&1
  echo "=== codec_diag l$LM $(date) ===" >> "$LOG"
  timeout 1200 python scripts/codec_diag.py -m "$DIR" \
      --out "$DIR/codec_diag.json" >> "$LOG" 2>&1
done

echo "=== rd_table $(date) ===" >> "$LOG"
timeout 300 python scripts/rd_table.py --out "$OUT" >> "$LOG" 2>&1

echo "=== final bench $(date) ===" >> "$LOG"
timeout 900 python bench.py >> "$LOG" 2>&1
echo "=== finalize done $(date) ===" >> "$LOG"
