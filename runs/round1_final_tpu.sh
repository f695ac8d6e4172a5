#!/bin/bash
set -u
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
LOG=/root/repo/runs/final_tpu.log
echo "=== perception round 2 $(date) ===" >> "$LOG"
rm -rf putting_dune_tpu/experiments/model_weights/{atom_detector,image_aligner,graph_aligner}/checkpoints
python runs/train_perception.py both >> "$LOG" 2>&1 || echo "perception2 failed" >> "$LOG"
echo "=== multi-dopant policy $(date) ===" >> "$LOG"
python runs/train_multidopant.py >> "$LOG" 2>&1 || echo "multidopant failed" >> "$LOG"
echo "=== final tpu queue done $(date) ===" >> "$LOG"
