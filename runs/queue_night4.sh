#!/bin/bash
# Fourth overnight TPU link: after queue_night3.sh (3-dopant evals),
# run the detector noise-robustness fine-tune with its two-metric
# gated ship. Fail closed if the night3 pid file is missing.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
L=/root/repo/runs/night4.log

run2() {
  "$@" >> "$L" 2>&1 || { sleep 45; "$@" >> "$L" 2>&1; } || \
    echo "FAILED: $*" >> "$L"
}

if [ ! -f /tmp/night3.pid ]; then
  echo "missing /tmp/night3.pid; refusing to start" >> "$L"
  exit 1
fi
while kill -0 "$(cat /tmp/night3.pid)" 2>/dev/null; do sleep 60; done
sleep 45

echo "=== detector noise-robust fine-tune $(date) ===" >> "$L"
run2 timeout 9000 python runs/train_detector_noiserobust.py 7200 0.4 1e-4
echo "=== night4 queue done $(date) ===" >> "$L"
