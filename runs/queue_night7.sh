#!/bin/bash
# Seventh overnight TPU link: after queue_night6.sh (3-dopant retrain),
# run the image-aligner noise-robustness fine-tune with its two-metric
# gated ship. Fail closed if the night6 pid file is missing.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
L=/root/repo/runs/night7.log

run2() {
  "$@" >> "$L" 2>&1 || { sleep 45; "$@" >> "$L" 2>&1; } || \
    echo "FAILED: $*" >> "$L"
}

if [ ! -f /tmp/night6.pid ]; then
  echo "missing /tmp/night6.pid; refusing to start" >> "$L"
  exit 1
fi
while kill -0 "$(cat /tmp/night6.pid)" 2>/dev/null; do sleep 60; done
sleep 45

echo "=== aligner noise-robust fine-tune $(date) ===" >> "$L"
run2 timeout 7200 python runs/train_aligner_noiserobust.py 5400 0.4 1e-4
echo "=== night7 queue done $(date) ===" >> "$L"
