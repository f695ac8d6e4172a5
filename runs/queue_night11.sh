#!/bin/bash
# Night 11 (round 2 cont., post-reboot): after night10's small_eval
# sweeps, (a) exercise the 10k-seed big_eval suite on TPU for the first
# time — the whole suite as one device batch — and (b) re-run the three
# gated continuation trainers (workdirs were wiped by the VM reset; each
# warm-starts from the shipped incumbent and re-ships only on a win).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
L=/root/repo/runs/night11.log
: > "$L"

run2() {
  "$@" >> "$L" 2>&1 || { sleep 45; "$@" >> "$L" 2>&1; } || \
    echo "FAILED: $*" >> "$L"
}

# Wait for night10 to finish (marker line in its log).
while ! grep -q "night10 queue done" /root/repo/runs/night10.log 2>/dev/null; do
  sleep 60
done
sleep 45

echo "=== big_eval greedy_simple_rates (10k seeds, one batch) $(date) ===" >> "$L"
run2 timeout 3600 python -m putting_dune_tpu.eval \
  --experiment_name=greedy_simple_rates --eval_suite=big_eval
echo "=== big_eval planner_prior_rates $(date) ===" >> "$L"
run2 timeout 3600 python -m putting_dune_tpu.eval \
  --experiment_name=planner_prior_rates --eval_suite=big_eval
echo "=== continue_pixels $(date) ===" >> "$L"
run2 timeout 6600 python runs/continue_pixels.py 5400
echo "=== detector noise-robust continuation $(date) ===" >> "$L"
run2 timeout 6600 python runs/train_detector_noiserobust.py 5400
echo "=== aligner noise-robust continuation $(date) ===" >> "$L"
run2 timeout 5400 python runs/train_aligner_noiserobust.py 4200
echo "=== night11 queue done $(date) ===" >> "$L"
