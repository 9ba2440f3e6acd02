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

# Protocol knobs. Defaults are the REFERENCE protocol above; the env
# overrides exist so tests/test_acceptance_script.py can execute this
# exact script end-to-end on synthetic fixtures at smoke scale (a bash
# typo or argument-plumbing bug must not wait for real checkpoints to
# surface).
YEAR=${ACC2018_YEAR:-2018}
SPM=${ACC2018_SAMPLES_PER_MONTH:-10}
ENS=${ACC2018_ENS:-20}
STEPS=${ACC2018_STEPS:-20}
RSEQ=${ACC2018_RETURN_SEQ:-4}
LEAD=${ACC2018_LEAD_H:-240}

if [[ "$CLIM" == *.zarr ]]; then
  # ACC2018_CONVERT_ARGS: extra converter flags (the smoke test passes
  # --allow_partial_doy for its 2-day synthetic climatology)
  # shellcheck disable=SC2086
  python -m ladcast_tpu.cli.convert_wb2_climatology \
    --input "$CLIM" --output "$OUT/climatology.npz" \
    ${ACC2018_CONVERT_ARGS:-}
  CLIM="$OUT/climatology.npz"
fi

# Reference protocol: 10 init times per month over 2018 (120 inits),
# 20 members, 20 EDM steps, 240 h. Multi-process hosts shard inits
# automatically (strided); single chip just runs them all.
python -m ladcast_tpu.cli.pred_rollout \
  --data "$DATA" \
  --dit_params "$DIT" --dcae_params "$DCAE" \
  --output_dir "$OUT/latents" \
  --year "$YEAR" --num_samples_per_month "$SPM" \
  --ensemble_size "$ENS" --num_inference_steps "$STEPS" \
  --return_seq_len "$RSEQ" --input_seq_len 1 \
  --total_lead_time_hour "$LEAD" --step_size_hour 6 \
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
# The verdict json + plot are written either way; propagate the
# pass/fail exit code after printing where they landed.
VERDICT_RC=0
python -m ladcast_tpu.cli.compare_baseline \
  --scores "$OUT/scores" \
  --plot "$OUT/scores/curves_vs_baseline.png" \
  --output "$OUT/scores/baseline_verdict.json" || VERDICT_RC=$?

echo "Verdict: $OUT/scores/baseline_verdict.json; curves: $OUT/scores/curves_vs_baseline.png"
exit "$VERDICT_RC"
