#!/bin/bash
# Round-5 follow-up hardware queue. Waits for round5_queue.sh (pid in
# /tmp/r5q.pid) to drain, then measures the COMPOSED fast path:
#
#  1. chain dpm20_int8 -- the production CLI chain with BOTH
#     skill-neutral levers on (reference's own DPM sampler at 20 NFE +
#     int8 w8a8 matmuls), scored in physical units like the others.
#  2. bench combo -- LADCAST_INT8=1 bench.py --sampler dpm --nfe 20,
#     the projected ~28 s headline fast-path wall clock.
#
# Logs: /tmp/r5_<step>.log, /tmp/bench_dpm20_int8.log.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
L=/tmp/r5_queue.log

if [ -f /tmp/r5q.pid ]; then
  while kill -0 "$(cat /tmp/r5q.pid)" 2>/dev/null; do sleep 30; done
fi
echo "=== round-5 queue2 start $(date) ===" >> "$L"

run() {
  local name=$1; shift
  echo "--- $name: $* $(date) ---" >> "$L"
  timeout "${STEP_TIMEOUT:-5400}" "$@" > "/tmp/r5_$name.log" 2>&1
  echo "exit=$? $(date)" >> "$L"
}

run chain_dpm20_int8 python -m ladcast_tpu.cli.pred_rollout \
  --data /tmp/rehearsal_eval_fields.npz \
  --dit_params /tmp/rehearsal_run/hub \
  --dcae_params /tmp/rehearsal_dcae \
  --output_dir /tmp/chain_dpm20_int8 \
  --start_date 2016-12-16 --end_date 2016-12-25T00 \
  --num_samples_per_month 6 --host_step \
  --ensemble_size 20 --total_lead_time_hour 240 \
  --sampler dpm --int8_matmuls

run score_dpm20_int8 python -m ladcast_tpu.cli.evaluate_ens \
  --latent_dir /tmp/chain_dpm20_int8 \
  --truth /tmp/rehearsal_eval_fields.npz \
  --dcae_params /tmp/rehearsal_dcae \
  --output_dir /tmp/chain_dpm20_int8_scores \
  --allow_truth_mean_climatology --diagnostics

run bench_combo env LADCAST_INT8=1 python bench.py --sampler dpm --nfe 20

echo "=== round-5 queue2 done $(date) ===" >> "$L"
