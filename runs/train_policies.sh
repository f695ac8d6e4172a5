#!/bin/bash
# Sequential TPU training of all registry checkpoint policies.
# Vector policies (6): ~26M env steps each. Then the pixels policy (long).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
LOG=/root/repo/runs/train_policies.log
WEIGHTS=/root/repo/putting_dune_tpu/experiments/model_weights
echo "=== start $(date) ===" >> "$LOG"

train_vector () {
  local exp=$1 ckpt=$2
  echo "--- $exp -> $ckpt $(date) ---" >> "$LOG"
  python -m putting_dune_tpu.agents.train_ppo \
    --train_experiment="$exp" --workdir="runs/$exp" \
    --batch_size=1024 --num_updates=400 --rollout_length=64 \
    --updates_per_chunk=100 --eval_suite=small_eval >> "$LOG" 2>&1
  mkdir -p "$WEIGHTS/$ckpt"
  cp "runs/$exp/policy/"* "$WEIGHTS/$ckpt/"
}

train_vector ppo_learned_2s 230127_from_state_2s
train_vector ppo_learned_3s 230127_from_state_3s
train_vector ppo_learned_4s 230127_from_state_4s
train_vector ppo_v3_2s 230422_ppo_v3_2s
train_vector ppo_v3_3s 230422_ppo_v3_3s
train_vector ppo_v3_4s 230422_ppo_v3_4s

echo "--- pixels: relative_simple_rates_from_images $(date) ---" >> "$LOG"
python -m putting_dune_tpu.agents.train_ppo \
  --train_experiment=relative_simple_rates_from_images \
  --workdir=runs/ppo_images \
  --batch_size=256 --num_updates=12000 --rollout_length=16 \
  --updates_per_chunk=200 --max_wall_seconds=5400 \
  --eval_suite=tiny_eval >> "$LOG" 2>&1
mkdir -p "$WEIGHTS/ppo_simple_images_tf"
cp runs/ppo_images/policy/* "$WEIGHTS/ppo_simple_images_tf/"
echo "=== all done $(date) ===" >> "$LOG"
