#!/bin/bash
# Session queue stage 4: waits for queue_session3c.sh, then records
# TPU-scale numbers for the new multi-dopant vision planner and the
# distilled-planner registry entries.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
L=/root/repo/runs/session3d.log
: > "$L"

run2() {
  "$@" >> "$L" 2>&1 || { sleep 45; "$@" >> "$L" 2>&1; } || \
    echo "FAILED: $*" >> "$L"
}

while ! grep -q "session3c queue done" /root/repo/runs/session3c.log 2>/dev/null; do
  sleep 60
done
sleep 45

echo "=== multi_dopant_2_vision_planner small_eval $(date) ===" >> "$L"
run2 timeout 3000 python -m putting_dune_tpu.eval \
  --experiment_name=multi_dopant_2_vision_planner --eval_suite=small_eval \
  --output_json=runs/md2_vision_small.json
echo "=== multi_dopant_3_vision_planner small_eval $(date) ===" >> "$L"
run2 timeout 3000 python -m putting_dune_tpu.eval \
  --experiment_name=multi_dopant_3_vision_planner --eval_suite=small_eval \
  --output_json=runs/md3_vision_small.json
echo "=== planner_distilled_prior small_eval $(date) ===" >> "$L"
run2 timeout 1800 python -m putting_dune_tpu.eval \
  --experiment_name=planner_distilled_prior --eval_suite=small_eval \
  --output_json=runs/distilled_small.json
echo "=== session3d queue done $(date) ===" >> "$L"
