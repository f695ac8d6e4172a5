#!/bin/bash
# Eighth TPU link: after queue_night7.sh (aligner noise-robust fine-tune),
# record a fresh benchmark line and sweep the full policy suite (now
# including the rate-aware planner experiments) at medium_eval on the TPU.
# Fail closed if the night7 pid file is missing.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
L=/root/repo/runs/night8.log

run2() {
  "$@" >> "$L" 2>&1 || { sleep 45; "$@" >> "$L" 2>&1; } || \
    echo "FAILED: $*" >> "$L"
}

if [ ! -f /tmp/night7.pid ]; then
  echo "missing /tmp/night7.pid; refusing to start" >> "$L"
  exit 1
fi
while kill -0 "$(cat /tmp/night7.pid)" 2>/dev/null; do sleep 60; done
sleep 45

echo "=== bench $(date) ===" >> "$L"
run2 timeout 1800 python bench.py
echo "=== policy suite medium_eval $(date) ===" >> "$L"
run2 timeout 7200 python runs/eval_policy_suite.py medium_eval
echo "=== night8 queue done $(date) ===" >> "$L"
