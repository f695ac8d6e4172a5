#!/bin/bash
# Overnight TPU chain (round 2 cont.): waits for queue_post_large.sh
# (detector ship + policy suite + bench) to finish, then runs the
# reference-scale aligner capacity experiment and its head-to-head ship
# decision. Each step retries once (stale single-owner TPU claims fail
# the next attach exactly once).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
L=/root/repo/runs/night.log

run2() {
  "$@" >> "$L" 2>&1 || { sleep 45; "$@" >> "$L" 2>&1; } || \
    echo "FAILED: $*" >> "$L"
}

while kill -0 "$(cat /tmp/queue.pid)" 2>/dev/null; do sleep 60; done
sleep 45

echo "=== aligner capacity run $(date) ===" >> "$L"
run2 timeout 10000 python runs/train_aligner_large.py 9000 32
sleep 45
echo "=== aligner ship decision $(date) ===" >> "$L"
run2 timeout 2400 python runs/ship_aligner.py runs/aligner_large_wd 20
echo "=== night queue done $(date) ===" >> "$L"
