#!/bin/bash
set -u
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
LOG=/root/repo/runs/train_pixels2.log
WEIGHTS=/root/repo/putting_dune_tpu/experiments/model_weights
echo "=== pixels (shaped) start $(date) ===" >> "$LOG"
for attempt in 1 2 3; do
  python -m putting_dune_tpu.agents.train_ppo \
    --train_experiment=relative_simple_rates_from_images \
    --workdir=runs/ppo_images_shaped \
    --batch_size=256 --num_updates=12000 --rollout_length=16 \
    --render_size=128 --reward_shaping=0.05 \
    --updates_per_chunk=200 --max_wall_seconds=6000 \
    --eval_suite=tiny_eval >> "$LOG" 2>&1 && break
  echo "attempt $attempt failed, retrying" >> "$LOG"
  sleep 20
done
mkdir -p "$WEIGHTS/ppo_simple_images_tf"
cp runs/ppo_images_shaped/policy/* "$WEIGHTS/ppo_simple_images_tf/"
echo "=== pixels (shaped) done $(date) ===" >> "$LOG"
