"""Production-shape FLOPs + MFU report for the bench sampler matrix.

Compiles the three scan-free component programs ONCE at north-star
shapes (bare 375M denoiser forward at B=20, per-repetition 80-frame
decode, encode), costs them with the PJRT compiled-executable analysis
(bench.make_bench flops_components), and combines with each sampler's
analytic call count (Heun 2N-1, DPM-Solver++(2M) N) -- the same
derivation bench.py's flops_per_forecast uses. Pass measured walls to
get delivered TFLOP/s and MFU vs the v5e 197 TFLOP/s bf16 peak:

  python scripts/bench_flops_report.py edm20=57.551 dpm20=33.197 \
      dpm15=26.589 dpm10=19.987
"""

import json
import sys

sys.path.insert(0, ".")

import bench  # noqa: E402
from ladcast_tpu.config import (  # noqa: E402
    DCAEConfig,
    EDMSchedulerConfig,
    RolloutConfig,
)
from ladcast_tpu.config import ladcast_375m_config  # noqa: E402

PEAK = 197e12  # v5e bf16


def main():
    walls = dict(a.split("=") for a in sys.argv[1:])

    rcfg = RolloutConfig(ensemble_size=20)
    b = bench.make_bench(ladcast_375m_config(), DCAEConfig(),
                         EDMSchedulerConfig(), rcfg)
    comps = b["flops_components"]()
    if comps is None:
        print("cost analysis unavailable")
        return
    f_net, f_dec, f_enc = comps
    print(json.dumps({"f_net_tflops": round(f_net / 1e12, 3),
                      "f_dec_per_rep_tflops": round(f_dec / 1e12, 3),
                      "f_enc_tflops": round(f_enc / 1e12, 3)}))
    for name in sorted(walls) or ["edm20"]:
        sampler = "edm" if name.startswith("edm") else "dpm"
        nfe = int(name[3:])
        ncalls = 2 * nfe - 1 if sampler == "edm" else nfe
        fl = rcfg.num_repetitions * (ncalls * f_net + f_dec) + f_enc
        row = {"config": name, "tflops": round(fl / 1e12, 1)}
        if name in walls:
            w = float(walls[name])
            row.update(wall_s=w,
                       tflop_per_s=round(fl / w / 1e12, 1),
                       mfu=round(fl / (w * PEAK), 4))
        print(json.dumps(row))


if __name__ == "__main__":
    main()
