#!/bin/bash
# Session queue stage 5: waits for queue_session3d.sh, then TPU-scale
# multi-dopant distillation attempts (bigger budget than the CPU passes)
# and TPU evals of whatever shipped.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
L=/root/repo/runs/session3e.log
: > "$L"

run2() {
  "$@" >> "$L" 2>&1 || { sleep 45; "$@" >> "$L" 2>&1; } || \
    echo "FAILED: $*" >> "$L"
}

while ! grep -q "session3d queue done" /root/repo/runs/session3d.log 2>/dev/null; do
  sleep 60
done
sleep 45

echo "=== md3 distill (TPU, 24 iters, batch 2048, hidden 512) $(date) ===" >> "$L"
run2 timeout 4200 python runs/distill_multidopant.py 3 24 2048 1 512
echo "=== md2 distill (TPU retry) $(date) ===" >> "$L"
run2 timeout 3000 python runs/distill_multidopant.py 2 16 2048 1 256
echo "=== session3e queue done $(date) ===" >> "$L"
