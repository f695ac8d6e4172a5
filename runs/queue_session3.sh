#!/bin/bash
# Session queue (round 2 cont., second post-reboot session): keep the
# TPU busy with gated continuation trainers — each warm-starts from the
# shipped incumbent and re-ships only on a head-to-head win.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
L=/root/repo/runs/session3.log
: > "$L"

run2() {
  "$@" >> "$L" 2>&1 || { sleep 45; "$@" >> "$L" 2>&1; } || \
    echo "FAILED: $*" >> "$L"
}

echo "=== continue_pixels $(date) ===" >> "$L"
run2 timeout 6600 python runs/continue_pixels.py 5400
echo "=== detector noise-robust continuation $(date) ===" >> "$L"
run2 timeout 6600 python runs/train_detector_noiserobust.py 5400
echo "=== aligner noise-robust continuation $(date) ===" >> "$L"
run2 timeout 5400 python runs/train_aligner_noiserobust.py 4200
echo "=== session3 queue done $(date) ===" >> "$L"
