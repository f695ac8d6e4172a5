#!/bin/bash
# Waits for the pixels PPO run to finish, then trains the perception stack.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
LOG=/root/repo/runs/train_perception.log
while ! grep -q "pixels done" /root/repo/runs/train_pixels.log 2>/dev/null; do
  sleep 60
done
echo "=== perception start $(date) ===" >> "$LOG"
for attempt in 1 2 3; do
  python runs/train_perception.py both >> "$LOG" 2>&1 && break
  echo "attempt $attempt failed, retrying" >> "$LOG"
  sleep 20
done
echo "=== perception done $(date) ===" >> "$LOG"
