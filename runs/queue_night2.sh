#!/bin/bash
# Second overnight TPU chain: waits for queue_night.sh (aligner capacity
# run + ship decision) to finish, then trains the 3-dopant PPO policy
# (runs/train_multidopant3.py). Retry-once per step (stale single-owner
# TPU claims fail the next attach exactly once).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
L=/root/repo/runs/night2.log

run2() {
  "$@" >> "$L" 2>&1 || { sleep 45; "$@" >> "$L" 2>&1; } || \
    echo "FAILED: $*" >> "$L"
}

while kill -0 "$(cat /tmp/night.pid)" 2>/dev/null; do sleep 60; done
sleep 45

echo "=== 3-dopant PPO training $(date) ===" >> "$L"
run2 timeout 5400 python runs/train_multidopant3.py 1200 4200
echo "=== night2 queue done $(date) ===" >> "$L"
