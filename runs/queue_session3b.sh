#!/bin/bash
# Session queue stage 2: waits for queue_session3.sh, then runs the
# gated 3-dopant PPO retrain (the weakest artifact in the zoo).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
L=/root/repo/runs/session3b.log
: > "$L"

run2() {
  "$@" >> "$L" 2>&1 || { sleep 45; "$@" >> "$L" 2>&1; } || \
    echo "FAILED: $*" >> "$L"
}

while ! grep -q "session3 queue done" /root/repo/runs/session3.log 2>/dev/null; do
  sleep 60
done
sleep 45

echo "=== continue_multidopant3 $(date) ===" >> "$L"
run2 timeout 7200 python runs/continue_multidopant3.py 2400 4500
echo "=== session3b queue done $(date) ===" >> "$L"
