#!/bin/bash
# Session queue stage 3: waits for queue_session3b.sh, then distills the
# planner into MLP policies on the TPU — the variable-dwell student
# (new capability) and a larger fixed-dwell retry (gated on beating the
# CPU-trained incumbent head-to-head).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
L=/root/repo/runs/session3c.log
: > "$L"

run2() {
  "$@" >> "$L" 2>&1 || { sleep 45; "$@" >> "$L" 2>&1; } || \
    echo "FAILED: $*" >> "$L"
}

while ! grep -q "session3b queue done" /root/repo/runs/session3b.log 2>/dev/null; do
  sleep 60
done
sleep 45

echo "=== distill variable $(date) ===" >> "$L"
run2 timeout 3600 python runs/distill_planner.py variable 16 1024 0
echo "=== distill fixed retry $(date) ===" >> "$L"
run2 timeout 3600 python runs/distill_planner.py fixed 16 2048 1
echo "=== session3c queue done $(date) ===" >> "$L"
