#!/bin/bash
# Fifth overnight TPU link: after queue_night4.sh (detector noise-robust
# fine-tune), continue the pixels policy with a gated re-ship. Fail
# closed if the night4 pid file is missing.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
L=/root/repo/runs/night5.log

run2() {
  "$@" >> "$L" 2>&1 || { sleep 45; "$@" >> "$L" 2>&1; } || \
    echo "FAILED: $*" >> "$L"
}

if [ ! -f /tmp/night4.pid ]; then
  echo "missing /tmp/night4.pid; refusing to start" >> "$L"
  exit 1
fi
while kill -0 "$(cat /tmp/night4.pid)" 2>/dev/null; do sleep 60; done
sleep 45

echo "=== pixels continuation $(date) ===" >> "$L"
run2 timeout 12000 python runs/continue_pixels.py 9000 1e-4
echo "=== night5 queue done $(date) ===" >> "$L"
