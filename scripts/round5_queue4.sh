#!/bin/bash
# Round-5 queue 4: the dpm15/dpm10 NFE-frontier chains, restarted after
# a host reboot wiped /tmp (the queue3 run never executed).
#
# The rehearsal checkpoint must be retrained, so this queue re-runs the
# EXACT baseline chain with the new checkpoint and lands everything in
# results/round5_chain_nfe/ -- the committed round5_chain tables (exact/
# int8/dpm20/dpm20_int8, one earlier checkpoint) stay self-consistent.
#
# Steps (serialized on the single axon v5e chip):
#   0. wait for the TPU backend to come back (known to go Unavailable
#      for an hour+; probe every 2 min, give up after ~100 min);
#   1. make_field_data (synthetic dynamics -> full-res physical fields
#      through a fixed random DCAE + re-encoded training latents);
#   2. train the real 375M 6k steps through cli.train_ar (hub export);
#   3. production CLI chain (pred_rollout 20 members x 240 h x 4 inits
#      -> evaluate_ens physical-unit decode+scoring) for exact / dpm15
#      / dpm10;
#   4. collect into results/round5_chain_nfe/.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
L=/tmp/r5_queue.log
echo $$ > /tmp/r5q.pid
echo "=== round-5 queue4 start $(date) ===" >> "$L"

probe_tpu() {
  timeout 150 python -c 'import jax; jax.numpy.zeros(4).sum().item()' \
    > /dev/null 2>&1
}

waited=0
until probe_tpu; do
  echo "tpu unavailable, waited ${waited}s $(date)" >> "$L"
  if [ "$waited" -ge 6000 ]; then
    echo "=== giving up waiting for TPU $(date) ===" >> "$L"
    exit 1
  fi
  sleep 120
  waited=$((waited + 270))
done
echo "tpu up $(date)" >> "$L"

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
chain dpm15 --sampler dpm --num_inference_steps 15
chain dpm10 --sampler dpm --num_inference_steps 10

run collect python scripts/collect_chain_results.py \
  --variants exact,dpm15,dpm10 \
  --out results/round5_chain_nfe

echo "=== round-5 queue4 done $(date) ===" >> "$L"
