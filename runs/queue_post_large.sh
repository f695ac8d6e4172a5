#!/bin/bash
# Post-capacity-experiment TPU queue: waits for the large-detector train
# to exit, then runs the head-to-head ship decision, sweeps the policy
# zoo on the 1000-seed suite, and re-runs the headline bench. Each step
# retries once (a killed TPU process can leave a stale single-owner
# claim that fails the next attach exactly once).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
L=/root/repo/runs/post_large.log

run2() {
  "$@" >> "$L" 2>&1 || { sleep 45; "$@" >> "$L" 2>&1; } || \
    echo "FAILED: $*" >> "$L"
}

# Fail CLOSED if the training pid file is missing: starting the queue's
# TPU jobs while the training still owns the single-owner TPU would make
# every step fail its attach.
if [ ! -f /tmp/detL.pid ]; then
  echo "missing /tmp/detL.pid; refusing to start" >> "$L"
  exit 1
fi
while kill -0 "$(cat /tmp/detL.pid)" 2>/dev/null; do sleep 60; done
sleep 45

echo "=== ship decision $(date) ===" >> "$L"
run2 timeout 1800 python runs/ship_detector.py runs/detector_large_wd 20
echo "=== policy suite medium_eval $(date) ===" >> "$L"
run2 timeout 3600 python runs/eval_policy_suite.py medium_eval
echo "=== bench $(date) ===" >> "$L"
run2 timeout 1200 python bench.py
echo "=== queue done $(date) ===" >> "$L"
