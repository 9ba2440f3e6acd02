#!/bin/bash
# Round-5 follow-up: complete the DPM NFE frontier through the REAL
# production CLI chain (pred_rollout -> evaluate_ens, physical units).
# dpm20 is already scored (results/round5_chain); this adds dpm15 and
# dpm10 with the same protocol + PRNG so the latent-rehearsal frontier
# (PERFORMANCE.md) gets production-scorer confirmation at every point.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
L=/tmp/r5_queue.log
echo $$ > /tmp/r5q.pid
echo "=== round-5 queue3 start $(date) ===" >> "$L"

run() {
  local name=$1; shift
  echo "--- $name: $* $(date) ---" >> "$L"
  timeout "${STEP_TIMEOUT:-5400}" "$@" > "/tmp/r5_$name.log" 2>&1
  echo "exit=$? $(date)" >> "$L"
}

for nfe in 15 10; do
  run "chain_dpm${nfe}" python -m ladcast_tpu.cli.pred_rollout \
    --data /tmp/rehearsal_eval_fields.npz \
    --dit_params /tmp/rehearsal_run/hub \
    --dcae_params /tmp/rehearsal_dcae \
    --output_dir "/tmp/chain_dpm${nfe}" \
    --start_date 2016-12-16 --end_date 2016-12-25T00 \
    --num_samples_per_month 6 --host_step \
    --ensemble_size 20 --total_lead_time_hour 240 \
    --sampler dpm --num_inference_steps "$nfe"

  run "score_dpm${nfe}" python -m ladcast_tpu.cli.evaluate_ens \
    --latent_dir "/tmp/chain_dpm${nfe}" \
    --truth /tmp/rehearsal_eval_fields.npz \
    --dcae_params /tmp/rehearsal_dcae \
    --output_dir "/tmp/chain_dpm${nfe}_scores" \
    --allow_truth_mean_climatology --diagnostics
done
echo "=== round-5 queue3 done $(date) ===" >> "$L"
