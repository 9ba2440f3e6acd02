#!/bin/bash
# Pending-TPU measurement queue (written late round 3 during a multi-hour
# axon backend outage). Run from /root/repo the moment the TPU probe
# (150s-timeout jnp.zeros(4).sum().item()) succeeds; results decide
# whether LADCAST_PALLAS_DENSE / LADCAST_PALLAS_DEPTHWISE flip from
# opt-in to default (ops/sphere.py gates).
#
#  1. check_kernels_tpu.py    -- MANDATORY after the round-3 ops/pallas
#                                commits (dense_conv.py, depthwise v2 tap
#                                order): production-shape exactness on
#                                hardware, incl. circular-W cases.
#  2. bench_dense_conv.py     -- implicit-GEMM dense conv vs conv HLO per
#                                production shape (plain + circular).
#  3. bench_depthwise.py      -- tap-reordered depthwise v2 re-measure
#                                (v1 was 8.13 vs 5.33 ms HLO).
#  4/5. bench_decode.py --batch  A/B: decode stage with/without the
#                                Pallas dense path (the ~10s lever of the
#                                57s bench).
# Then: if wins, flip defaults + rerun bench.py (~7 min, >=30 min
# timeout) and update PERFORMANCE.md; if losses, record the negative
# result and keep opt-in.
set -u
cd "$(dirname "$0")/.."
L=${1:-/tmp/tpu_queue.log}
echo "=== queue start $(date) ===" >> "$L"
run() {
  echo "--- $* ---" >> "$L"
  timeout 1800 "$@" >> "$L" 2>&1
  echo "exit=$?" >> "$L"
}
run python scripts/check_kernels_tpu.py
run python scripts/bench_dense_conv.py
run env LADCAST_PALLAS_DEPTHWISE=1 python scripts/bench_depthwise.py
run python scripts/bench_decode.py --batch 80
run env LADCAST_PALLAS_DENSE=1 python scripts/bench_decode.py --batch 80
#  6. int8 w8a8 DiT matmul path A/B (ops/quant.py, round-3b): forward
#     speedup + full-repetition speedup + latent deviation.
run python scripts/bench_int8.py --full
echo "=== queue done $(date) ===" >> "$L"
