#!/bin/bash
# Re-run of the night9 plan after the VM reboot killed the queue:
# TPU-scale (small_eval, 100 seeds) numbers for the zero-training
# controllers — vision planner and the multi-dopant planners.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
L=/root/repo/runs/night10.log
: > "$L"

run2() {
  "$@" >> "$L" 2>&1 || { sleep 45; "$@" >> "$L" 2>&1; } || \
    echo "FAILED: $*" >> "$L"
}

echo "=== vision_planner_simple_rates small_eval $(date) ===" >> "$L"
run2 timeout 3600 python -m putting_dune_tpu.eval \
  --experiment_name=vision_planner_simple_rates --eval_suite=small_eval
echo "=== multi_dopant planners small_eval $(date) ===" >> "$L"
run2 timeout 2400 python -m putting_dune_tpu.eval \
  --experiment_name=multi_dopant_2_planner --eval_suite=small_eval
run2 timeout 2400 python -m putting_dune_tpu.eval \
  --experiment_name=multi_dopant_3_planner --eval_suite=small_eval
echo "=== night10 queue done $(date) ===" >> "$L"
