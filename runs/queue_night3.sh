#!/bin/bash
# Third overnight TPU link: waits for queue_night2.sh (3-dopant PPO
# training) to finish, then drives the new policy and the random
# baseline through the eval CLI (the end-to-end proof the registry entry
# needs). Fail closed if the night2 pid file is missing.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
L=/root/repo/runs/night3.log

run2() {
  "$@" >> "$L" 2>&1 || { sleep 45; "$@" >> "$L" 2>&1; } || \
    echo "FAILED: $*" >> "$L"
}

if [ ! -f /tmp/night2.pid ]; then
  echo "missing /tmp/night2.pid; refusing to start" >> "$L"
  exit 1
fi
while kill -0 "$(cat /tmp/night2.pid)" 2>/dev/null; do sleep 60; done
sleep 45

echo "=== multi_dopant_3_ppo tiny_eval $(date) ===" >> "$L"
run2 timeout 2400 python -m putting_dune_tpu.eval \
  --experiment_name=multi_dopant_3_ppo --eval_suite=tiny_eval
echo "=== multi_dopant_3_random tiny_eval $(date) ===" >> "$L"
run2 timeout 2400 python -m putting_dune_tpu.eval \
  --experiment_name=multi_dopant_3_random --eval_suite=tiny_eval
echo "=== night3 queue done $(date) ===" >> "$L"
