#!/bin/bash
# Ninth TPU link: after queue_night8.sh (bench + medium policy sweep),
# record TPU-scale numbers for the zero-training controllers added this
# session: the vision planner (pixels -> detector -> geometry -> plan)
# and the multi-dopant planners. Fail closed if the night8 pid file is
# missing.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
L=/root/repo/runs/night9.log

run2() {
  "$@" >> "$L" 2>&1 || { sleep 45; "$@" >> "$L" 2>&1; } || \
    echo "FAILED: $*" >> "$L"
}

if [ ! -f /tmp/night8.pid ]; then
  echo "missing /tmp/night8.pid; refusing to start" >> "$L"
  exit 1
fi
while kill -0 "$(cat /tmp/night8.pid)" 2>/dev/null; do sleep 60; done
sleep 45

echo "=== vision_planner_simple_rates small_eval $(date) ===" >> "$L"
run2 timeout 3600 python -m putting_dune_tpu.eval \
  --experiment_name=vision_planner_simple_rates --eval_suite=small_eval
echo "=== multi_dopant planners small_eval $(date) ===" >> "$L"
run2 timeout 2400 python -m putting_dune_tpu.eval \
  --experiment_name=multi_dopant_2_planner --eval_suite=small_eval
run2 timeout 2400 python -m putting_dune_tpu.eval \
  --experiment_name=multi_dopant_3_planner --eval_suite=small_eval
echo "=== night9 queue done $(date) ===" >> "$L"
