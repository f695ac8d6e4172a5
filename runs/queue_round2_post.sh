#!/bin/bash
# Round-2 post-perception TPU queue: waits for the perception train to
# exit, then fine-tunes the aligner under the registration protocol,
# times the f32 CLAHE kernel, runs the headline bench, and drives the
# reference-scale rate-learning loop. Each step retries once (a killed
# TPU process can leave a stale single-owner claim that fails the next
# attach exactly once).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
L=/root/repo/runs/post2.log

run2() {
  "$@" >> "$L" 2>&1 || { sleep 30; "$@" >> "$L" 2>&1; } || \
    echo "FAILED: $*" >> "$L"
}

while kill -0 "$(cat /tmp/train.pid)" 2>/dev/null; do sleep 60; done
sleep 30

echo "=== aligner2 (registration fine-tune) $(date) ===" >> "$L"
run2 python runs/train_perception2.py aligner2 2400
echo "=== clahe f32 timing $(date) ===" >> "$L"
run2 python /tmp/time_clahe_f32.py
echo "=== bench $(date) ===" >> "$L"
run2 python bench.py
echo "=== rate production $(date) ===" >> "$L"
run2 python runs/rate_loop_production.py
echo "=== post2 done $(date) ===" >> "$L"
