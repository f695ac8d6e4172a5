#!/bin/bash
# Sixth overnight TPU link: after queue_night5.sh (pixels continuation),
# retrain the 3-dopant policy with 5x the update budget (the first run's
# terminal rate was still rising linearly at its 1200-update cap; it
# reached 60% goals on tiny_eval vs 0% random) and re-run the eval CLI.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
L=/root/repo/runs/night6.log

run2() {
  "$@" >> "$L" 2>&1 || { sleep 45; "$@" >> "$L" 2>&1; } || \
    echo "FAILED: $*" >> "$L"
}

if [ ! -f /tmp/night5.pid ]; then
  echo "missing /tmp/night5.pid; refusing to start" >> "$L"
  exit 1
fi
while kill -0 "$(cat /tmp/night5.pid)" 2>/dev/null; do sleep 60; done
sleep 45

echo "=== 3-dopant PPO retrain (6000 updates) $(date) ===" >> "$L"
run2 timeout 4800 python runs/train_multidopant3.py 6000 3600
echo "=== multi_dopant_3_ppo tiny_eval $(date) ===" >> "$L"
run2 timeout 2400 python -m putting_dune_tpu.eval \
  --experiment_name=multi_dopant_3_ppo --eval_suite=tiny_eval
echo "=== night6 queue done $(date) ===" >> "$L"
