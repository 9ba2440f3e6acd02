#!/bin/bash
# Round-5 hardware queue (VERDICT r4 next-round #1 + #3).
#
# Runs the full rehearsal-on-hardware protocol end to end, serialized on
# the single axon v5e chip:
#
#  1. make_field_data    -- synthetic latent dynamics decoded to full-res
#                           physical fields through a fixed random DCAE;
#                           training latents are the RE-ENCODE of those
#                           fields (exactly pred_rollout's conditioning).
#  2. train 375M 6k steps through the production cli.train_ar
#                           (batch 4, push-forward 2, hub export).
#  3. rehearsal --eval    -- latent-space noise-matched skill A/B:
#                           exact Heun vs int8 vs dpm20/dpm15/dpm10
#                           (the reference's own pipeline_AR sampler).
#  4. REAL CLI chain at the full protocol: cli.pred_rollout (20 members,
#     240 h, 3 init times from the date-range selector) ->
#     cli.evaluate_ens (physical-unit RMSE/CRPS/ACC through the
#     production scorer's decode), for exact / int8 / dpm20.
#
# Logs: /tmp/r5_<step>.log; JSON summaries land in the score dirs.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
L=/tmp/r5_queue.log
# round5_queue2.sh serializes on this pid file -- write it ourselves so
# the gate works no matter how this script is launched.
echo $$ > /tmp/r5q.pid
echo "=== round-5 queue start $(date) ===" >> "$L"
run() {
  local name=$1; shift
  echo "--- $name: $* $(date) ---" >> "$L"
  timeout "${STEP_TIMEOUT:-5400}" "$@" > "/tmp/r5_$name.log" 2>&1
  echo "exit=$? $(date)" >> "$L"
}

run field_data python scripts/science_gate_rehearsal.py --make_field_data

run train python -m ladcast_tpu.cli.train_ar \
  --config configs/ladcast_375m.yaml \
  --latents /tmp/rehearsal_train.npz \
  --output_dir /tmp/rehearsal_run \
  --num_steps 6000 --num_push_forward_steps 2 --hub_export

run eval_latent python scripts/science_gate_rehearsal.py --eval \
  --ckpt /tmp/rehearsal_run/hub \
  --variants exact,int8,dpm20,dpm15,dpm10

chain() {
  local name=$1; shift
  run "chain_$name" python -m ladcast_tpu.cli.pred_rollout \
    --data /tmp/rehearsal_eval_fields.npz \
    --dit_params /tmp/rehearsal_run/hub \
    --dcae_params /tmp/rehearsal_dcae \
    --output_dir "/tmp/chain_$name" \
    --start_date 2016-12-16 --end_date 2016-12-25T00 \
    --num_samples_per_month 6 --host_step \
    --ensemble_size 20 --total_lead_time_hour 240 "$@"
  run "score_$name" python -m ladcast_tpu.cli.evaluate_ens \
    --latent_dir "/tmp/chain_$name" \
    --truth /tmp/rehearsal_eval_fields.npz \
    --dcae_params /tmp/rehearsal_dcae \
    --output_dir "/tmp/chain_${name}_scores" \
    --allow_truth_mean_climatology --diagnostics
}

chain exact
chain int8 --int8_matmuls
chain dpm20 --sampler dpm
echo "=== round-5 queue done $(date) ===" >> "$L"
