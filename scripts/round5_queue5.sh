#!/bin/bash
# Round-5 queue 5: resume queue4 after the final orbax state save hung
# the axon tunnel (bulk multi-GB D2H; see PERFORMANCE.md caveats).
# Field data from queue4 is reused; the 375M retrains with
# --skip_state_ckpt (hub export only, now written FIRST and fetched
# leaf-by-leaf), then the exact/dpm15/dpm10 production CLI chains.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
L=/tmp/r5_queue.log
echo $$ > /tmp/r5q.pid
echo "=== round-5 queue5 start $(date) ===" >> "$L"

run() {
  local name=$1; shift
  echo "--- $name: $* $(date) ---" >> "$L"
  timeout "${STEP_TIMEOUT:-5400}" "$@" > "/tmp/r5_$name.log" 2>&1
  echo "exit=$? $(date)" >> "$L"
}

run train python -m ladcast_tpu.cli.train_ar \
  --config configs/ladcast_375m.yaml \
  --latents /tmp/rehearsal_train.npz \
  --output_dir /tmp/rehearsal_run2 \
  --num_steps 6000 --num_push_forward_steps 2 \
  --hub_export --skip_state_ckpt

chain() {
  local name=$1; shift
  run "chain_$name" python -m ladcast_tpu.cli.pred_rollout \
    --data /tmp/rehearsal_eval_fields.npz \
    --dit_params /tmp/rehearsal_run2/hub \
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

echo "=== round-5 queue5 done $(date) ===" >> "$L"
