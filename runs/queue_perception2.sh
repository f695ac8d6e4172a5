#!/bin/bash
set -u
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
LOG=/root/repo/runs/train_perception.log
while ! grep -q "pixels (shaped) done" /root/repo/runs/train_pixels2.log 2>/dev/null; do
  sleep 60
done
sleep 30
echo "=== perception resume $(date) ===" >> "$LOG"
for attempt in 1 2 3; do
  python runs/train_perception.py both >> "$LOG" 2>&1 && break
  echo "attempt $attempt failed, retrying" >> "$LOG"
  sleep 30
done
echo "=== perception done $(date) ===" >> "$LOG"
