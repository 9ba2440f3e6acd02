#!/bin/bash
# Science acceptance run: the reference's de-facto benchmark protocol
# (reference README.md:124-149 -- 2018 full year, ensemble 20, 20 EDM
# inference steps, return_seq_len 4, 240 h lead at 6 h steps,
# input_seq_len 1, noise_level 0), scored against BASELINE.md's
# digitized RMSE/CRPS curves.
#
# BLOCKED until two artifacts exist (neither ships in this image):
#   1. published checkpoints -- diffusers `save_pretrained` directories
#      (tonyzyl/ladcast V0.1.X): pass the model dirs below; hub-layout
#      ingestion (config.json + sharded safetensors + ar_model_ema/)
#      loads them with zero manual flags.
#   2. ERA5 2018 truth + climatology -- a WB2 zarr (or the repo's .npz
#      bundle / tar-archive layout); convert a WB2 climatology with
#      cli/convert_wb2_climatology.
#
# Usage:
#   scripts/acceptance_2018.sh <dit_ckpt_dir> <dcae_ckpt_dir> \
#       <era5_2018_data> <climatology.{zarr,npz}> <output_dir>
#
# Pass/fail: per-variable ens-mean lat-weighted RMSE and CRPS at each
# lead time land within digitizing tolerance of BASELINE.md's curves
# (they are approximate reads off assets/2018_rmse.png -- expect a few
# percent, not exact equality). Also validate the opt-in
# --correction_skip_period against the exact run here (PERFORMANCE.md)
# before it may ever default on.
set -euo pipefail

DIT=$1; DCAE=$2; DATA=$3; CLIM=$4; OUT=$5

if [[ "$CLIM" == *.zarr ]]; then
  python -m ladcast_tpu.cli.convert_wb2_climatology \
    --input "$CLIM" --output "$OUT/climatology.npz"
  CLIM="$OUT/climatology.npz"
fi

# Reference protocol: 10 init times per month over 2018 (120 inits),
# 20 members, 20 EDM steps, 240 h. Multi-process hosts shard inits
# automatically (strided); single chip just runs them all.
python -m ladcast_tpu.cli.pred_rollout \
  --data "$DATA" \
  --dit_params "$DIT" --dcae_params "$DCAE" \
  --output_dir "$OUT/latents" \
  --year 2018 --num_samples_per_month 10 \
  --ensemble_size 20 --num_inference_steps 20 \
  --return_seq_len 4 --input_seq_len 1 \
  --total_lead_time_hour 240 --step_size_hour 6 \
  --noise_level 0.0 --sampler edm --seed 0

python -m ladcast_tpu.cli.evaluate_ens \
  --latent_dir "$OUT/latents" \
  --truth "$DATA" \
  --climatology "$CLIM" \
  --dcae_params "$DCAE" \
  --output_dir "$OUT/scores" \
  --diagnostics

# Executable pass/fail against BASELINE.md's digitized curves (exits
# nonzero when any (variable, day) point exceeds baseline * 1.15).
python -m ladcast_tpu.cli.compare_baseline \
  --scores "$OUT/scores" \
  --plot "$OUT/scores/curves_vs_baseline.png" \
  --output "$OUT/scores/baseline_verdict.json"

echo "Verdict: $OUT/scores/baseline_verdict.json; curves: $OUT/scores/curves_vs_baseline.png"
